"""Interactive case-study REPL.

Replaces reference case_study/step_gen.py (broken as checked in: it imports
the missing models/utils — step_gen.py:3) and the interactive mask REPL
inside the reference LLaVA-NeXT forward (llavanext.py:833-875): caption an
image, inspect per-visual-token uncertainty, and re-run with manual mask
overrides.

Usage:
  python -m dropoutdecoding_tpu.cli.step_gen \
      --model llava-1.5 --model-path /ckpts/llava-1.5-7b-hf
then enter image paths at the prompt; commands:
  <path>              caption the image with dropout decoding
  !uncert             print top/bottom-10 uncertainty tokens for last image
  !greedy <path>      caption without the ensemble
  !quit
"""
from __future__ import annotations

import argparse

import numpy as np


def main(args):
    from argparse import Namespace

    from PIL import Image

    from .chair_test import PROMPTS, make_engine, run_engine

    eng_args = Namespace(
        model=args.model,
        model_path=args.model_path,
        opera=False,
        vcd=False,
        original=False,
        num_beams=1,
        avg=False,
        voting_numbers=3,
        use_random=False,
        seed=args.seed,
    )
    engine, processor = make_engine(eng_args)
    last_state = None

    while True:
        try:
            line = input("image> ").strip()
        except EOFError:
            break
        if not line:
            continue
        if line == "!quit":
            break
        if line == "!uncert":
            if last_state is None:
                print("no image yet")
                continue
            epis = np.asarray(last_state.epis[0])
            valid = np.asarray(last_state.visual_mask[0])
            epis = np.where(valid, epis, -np.inf)
            order = np.argsort(-epis)
            print("most uncertain visual tokens:", order[:10].tolist())
            print("least uncertain visual tokens:", order[-10:].tolist())
            print(
                "image-level epis/alea:",
                float(np.asarray(last_state.uncertainty["epis_uncert"][0])),
                float(np.asarray(last_state.uncertainty["alea_uncert"][0])),
            )
            continue
        greedy = line.startswith("!greedy ")
        path = line[len("!greedy "):] if greedy else line
        try:
            image = Image.open(path).convert("RGB")
        except Exception as e:
            print("cannot open:", e)
            continue
        engine.ensemble = not greedy
        text = run_engine(engine, processor, args.model, PROMPTS[args.model], image)
        print(text)
        # keep the state for !uncert (re-run prefill only)
        try:
            if args.model == "llava-1.5":
                inputs = processor(PROMPTS[args.model], image)
                last_state = engine.prefill(
                    inputs["input_ids"], inputs["pixel_values"]
                )
        except Exception:
            pass


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="llava-1.5")
    p.add_argument("--model-path", required=True)
    p.add_argument("--seed", type=int, default=None)
    main(p.parse_args())
