"""POPE probing harness — reference pope_test/pope_test.py compatible
(per-strategy question files, max_new_tokens=1 fast path, timestamped
answer archive, confusion-matrix report), minus its hard-coded personal
paths (pope_test.py:149-154, 202-220 — replaced by flags).

Usage:
  python -m dropoutdecoding_tpu.cli.pope_test \
      --model llava --model-path /ckpts/llava-1.5-7b-hf \
      --coco-data-dir /data/coco --pope-dir ./pope_out --number 3000
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np
from datetime import datetime

from ..evalsuite.pope import (
    build_questions,
    parse_question_file,
    print_scores,
    score_answers,
    write_questions,
)
from .chair_test import str2bool

POPE_PROMPTS = {
    "llava-next": "[INST] <image>\n{}[/INST]",
    "llava": "USER: <image>\n{} ASSISTANT:",
    "instructblip": "{}",
}


def refresh_questions(coco_data_dir: str, out_dir: str, n_images: int = 500, seed=None):
    """Regenerate the three question files from instance segmentations
    (reference pope_metric/main.py:22-64: 500 images with >= 3 objects,
    sample_num=3)."""
    from ..evalsuite.chair import _load_synonyms  # canonical names only
    import random

    with open(os.path.join(coco_data_dir, "annotations/instances_val2014.json")) as f:
        inst = json.load(f)
    id_to_name = {c["id"]: c["name"] for c in inst["categories"]}
    img_file = {im["id"]: im["file_name"] for im in inst["images"]}
    objs = {}
    for ann in inst["annotations"]:
        objs.setdefault(ann["image_id"], [])
        name = id_to_name[ann["category_id"]]
        if name not in objs[ann["image_id"]]:
            objs[ann["image_id"]].append(name)
    rich = [i for i, o in objs.items() if len(o) >= 3]
    rng = random.Random(seed)
    chosen = rng.sample(rich, min(n_images, len(rich)))
    segments = [{"image": img_file[i], "objects": objs[i]} for i in chosen]
    paths = {}
    for strategy in ("random", "popular", "adversarial"):
        qs = build_questions(segments, sample_num=3, neg_strategy=strategy, seed=seed)
        paths[strategy] = write_questions(qs, out_dir, "coco", strategy)
    return paths


def main(args):
    from PIL import Image

    question_dir = os.path.join(args.pope_dir, "output", "coco")
    if str2bool(args.refresh_data):
        # explicit regeneration from COCO instance annotations
        # (reference pope_metric/main.py flow; needs instances_val2014.json)
        paths = refresh_questions(
            args.coco_data_dir, question_dir, seed=args.seed
        )
        print(f"Question files written: {list(paths.values())}")
    elif not os.path.isdir(question_dir):
        # default: seed from the vendored CANONICAL question sets (the
        # frozen files the reference's answer archives were scored on;
        # evalsuite/data/pope/PROVENANCE.md) — no COCO annotations needed
        from ..evalsuite.pope import seed_question_dir

        paths = seed_question_dir(question_dir)
        print(f"Canonical question files vendored: {paths}")

    # pope_test model names: llava-next | llava | instructblip
    # (reference pope_test.py:149-154); map to chair_test naming.
    model_key = {"llava": "llava-1.5", "llava-next": "llava-next",
                 "instructblip": "instructblip"}[args.model]
    if str2bool(getattr(args, "prefix_cache", False)) and model_key == "instructblip":
        # fail before the model loads — the constraint is structural
        raise SystemExit(
            "--prefix-cache cannot apply to InstructBLIP: its Q-Former "
            "reads the question text (reference instructblip.py:617-631 "
            "passes qformer_input_ids), so the 32 visual tokens — the "
            "START of the merged sequence — differ per question and no "
            "shared LM prefix exists.  Use --batch-size instead: the "
            "batched probe already runs the EVA-ViT-g tower once per "
            "unique image (the expensive shared stage)."
        )
    from argparse import Namespace

    from .chair_test import make_engine, run_engine

    eng_args = Namespace(
        model=model_key,
        model_path=args.model_path,
        opera=False,
        vcd=False,
        original=args.original,
        num_beams=1,
        avg=args.avg,
        voting_numbers=args.voting_numbers,
        use_random=args.use_random,
        seed=args.seed,
        quantize=getattr(args, "quantize", None),
        int8_kv=getattr(args, "int8_kv", False),
        int8_prefix_cache=getattr(args, "int8_prefix_cache", False),
    )
    engine, processor = make_engine(eng_args)
    # POPE needs a single token (reference pope_test.py:239-242)
    import dataclasses

    engine.gen = dataclasses.replace(engine.gen, max_new_tokens=1)

    ans_dir = os.path.join(args.pope_dir, "answer")
    os.makedirs(ans_dir, exist_ok=True)
    image_base = os.path.join(args.coco_data_dir, "val2014")

    # Snapshot the question sets used by THIS run into
    # pope_samples/<timestamp>/coco/ (reference pope_test.py:33-53), so
    # answer archives stay reproducible even after --refresh-data
    # regenerates the live question files.
    import shutil

    run_stamp = datetime.now().strftime("%m-%d_%H-%M-%S")
    snap_dir = os.path.join(args.pope_dir, "pope_samples", run_stamp, "coco")
    os.makedirs(snap_dir, exist_ok=True)
    for strategy in ("adversarial", "popular", "random"):
        src = os.path.join(question_dir, f"coco_pope_{strategy}.json")
        shutil.copy2(src, os.path.join(snap_dir, os.path.basename(src)))
    print(f"Question snapshot: {snap_dir}")

    for strategy in ("adversarial", "popular", "random"):
        qfile = os.path.join(snap_dir, f"coco_pope_{strategy}.json")
        print(f"the pope file is {qfile}")
        questions = parse_question_file(qfile)
        n = min(args.number, len(questions))
        answers = []
        from tqdm import tqdm

        batch = max(getattr(args, "batch_size", 1) or 1, 1)
        use_prefix = str2bool(getattr(args, "prefix_cache", False))
        if use_prefix:
            # Prefix caching: POPE asks ~6 consecutive questions per
            # image whose merged prompts share everything up to the
            # question text (~580 of ~615 tokens at LLaVA-1.5 shapes).
            # The shared [text-prefix + image] span prefills ONCE per
            # image (engine.probe_prefix); per-question tails run through
            # prefill_extend attending to the cached prefix — numerically
            # identical to the full probe (tests/test_prefix_extend.py).
            # The reference re-prefills the whole prompt per question
            # (pope_test.py:239-242).
            t1 = np.asarray(
                processor(POPE_PROMPTS[args.model].format("aaaa"))["input_ids"]
            )[0]
            t2 = np.asarray(
                processor(POPE_PROMPTS[args.model].format("zzzz"))["input_ids"]
            )[0]
            m = min(len(t1), len(t2))
            neq = np.nonzero(t1[:m] != t2[:m])[0]
            tpl_p = int(neq[0]) if len(neq) else m  # template prefix len

            groups = []
            for q in questions[:n]:
                if groups and groups[-1][0] == q["image"]:
                    groups[-1][1].append(q)
                else:
                    groups.append((q["image"], [q]))
            QPAD = 8  # tail-row bucket (one compile per tail-len bucket)
            from .chair_test import next_image_prep

            for image_name, qs in tqdm(groups):
                image = Image.open(
                    os.path.join(image_base, image_name)
                ).convert("RGB")
                rows, px, tiles, orig = [], None, None, None
                if model_key == "llava-next":
                    # anyres tiles once per image; the packed-tile prefix
                    # is ~2,900 of the ~2,930 merged tokens, so the cache
                    # removes nearly the whole per-question prefill
                    tiles, orig = next_image_prep(engine)(image)
                    px = True  # text-only processor calls below
                for q in qs:
                    prompt = POPE_PROMPTS[args.model].format(q["text"])
                    e = processor(prompt, image if px is None else None)
                    if px is None:
                        px = np.asarray(e["pixel_values"])
                    rows.append(np.asarray(e["input_ids"])[0])
                # group prefix: the template prefix, shrunk if BPE merges
                # at the question boundary perturbed any row, and leaving
                # >= 1 real tail token per row
                p_use = min(tpl_p, min(len(r) for r in rows) - 1)
                while p_use > 1 and any(
                    not np.array_equal(r[:p_use], rows[0][:p_use])
                    for r in rows
                ):
                    p_use -= 1
                img_pos = int(
                    np.nonzero(rows[0] == engine.cfg.image_token_index)[0][0]
                )
                if p_use <= img_pos:
                    raise SystemExit(
                        "--prefix-cache: shared prefix does not cover the "
                        "image token for this prompt template"
                    )
                tails = [r[p_use:] for r in rows]
                S = -(-max(len(t) for t in tails) // 8) * 8
                Q = len(tails)
                Qp = -(-Q // QPAD) * QPAD
                tail_ids = np.zeros((Qp, S), np.int32)
                lens = np.ones((Qp,), np.int32)
                for i, t in enumerate(tails):
                    tail_ids[i, : len(t)] = t
                    lens[i] = len(t)
                if model_key == "llava-next":
                    handle = engine.probe_prefix(
                        rows[0][:p_use][None], tiles, orig
                    )
                else:
                    handle = engine.probe_prefix(rows[0][:p_use][None], px)
                result = engine.probe_extend(handle, tail_ids, lens)
                toks = np.asarray(result.first_token)[:Q]
                for q, t in zip(qs, toks):
                    answers.append(
                        {
                            "question": q["text"],
                            "answer": processor.decode([int(t)]).strip(),
                        }
                    )
        elif batch > 1:
            # Batched fast path: a POPE answer is one token = the argmax
            # at the prompt's last position, so the whole workload is
            # prefill.  Questions differ in length — right-pad the batch
            # and pass per-row text_lens (engine._prefill_impl handles
            # variable-length rows exactly; tested in tests/test_engine.py
            # ::test_variable_length_batched_prefill_matches_per_row).
            # Text length buckets to a multiple of 8 to bound recompiles.
            def pad_rows(rows):
                """Right-pad int rows to a common multiple-of-8 length;
                returns (ids [B, S], mask [B, S])."""
                S = -(-max(len(r) for r in rows) // 8) * 8
                out = np.zeros((len(rows), S), np.int32)
                mask = np.zeros((len(rows), S), np.int32)
                for i, r in enumerate(rows):
                    out[i, : len(r)] = r
                    mask[i, : len(r)] = 1
                return out, mask

            from .chair_test import next_image_prep, qformer_ids_for

            for start in tqdm(range(0, n, batch)):
                group = questions[start : min(start + batch, n)]
                # POPE asks 6 consecutive questions per image: decode +
                # preprocess + ViT each UNIQUE image once; rows map to
                # images via image_index (engine.probe gathers features)
                id_rows, q_rows, image_index = [], [], []
                uniq_px, uniq_tiles, uniq_origs = [], [], []
                img_slot = {}
                for q in group:
                    prompt = POPE_PROMPTS[args.model].format(q["text"])
                    if q["image"] not in img_slot:
                        img_slot[q["image"]] = len(img_slot)
                        image = Image.open(
                            os.path.join(image_base, q["image"])
                        ).convert("RGB")
                        if model_key == "llava-next":
                            t, o = next_image_prep(engine)(image)
                            uniq_tiles.append(t)
                            uniq_origs.append(o)
                        else:
                            uniq_px.append(
                                np.asarray(processor(prompt, image)["pixel_values"])
                            )
                    image_index.append(img_slot[q["image"]])
                    e = processor(prompt)
                    id_rows.append(np.asarray(e["input_ids"])[0])
                    if model_key == "instructblip":
                        q_rows.append(
                            np.asarray(qformer_ids_for(processor, prompt, e))[0]
                        )
                # static batch: replicate the last ROW on the tail group
                # (its image is already in the unique set — no extra ViT)
                n_pad = batch - len(group)
                for rows in (id_rows, q_rows, image_index):
                    if rows:
                        rows.extend([rows[-1]] * n_pad)
                # bucket the unique-image count to a power of two so the
                # jitted probe sees few distinct U shapes (POPE's 6
                # questions/image makes U=2 the steady state at batch 8)
                U = len(img_slot)
                U_pad = 1 << (U - 1).bit_length()
                for rows in (uniq_px, uniq_tiles, uniq_origs):
                    if rows:
                        rows.extend([rows[-1]] * (U_pad - U))
                lens = np.array([len(r) for r in id_rows], np.int32)
                ids, _ = pad_rows(id_rows)
                image_index = np.asarray(image_index, np.int32)
                if model_key == "llava-next":
                    result = engine.probe(
                        ids, uniq_tiles, uniq_origs, text_lens=lens,
                        image_index=image_index,
                    )
                elif model_key == "instructblip":
                    # the Q-Former also reads the (variable-length)
                    # question; pads are masked in its attention
                    q_ids, q_mask = pad_rows(q_rows)
                    result = engine.probe(
                        ids, np.concatenate(uniq_px, 0), q_ids,
                        text_lens=lens, qformer_attention_mask=q_mask,
                        image_index=image_index,
                    )
                else:
                    result = engine.probe(
                        ids, np.concatenate(uniq_px, 0), text_lens=lens,
                        image_index=image_index,
                    )
                toks = np.asarray(result.first_token)
                for q, t in zip(group, toks):
                    answers.append(
                        {
                            "question": q["text"],
                            "answer": processor.decode([int(t)]).strip(),
                        }
                    )
        else:
            for q in tqdm(questions[:n]):
                image = Image.open(
                    os.path.join(image_base, q["image"])
                ).convert("RGB")
                prompt = POPE_PROMPTS[args.model].format(q["text"])
                text = run_engine(
                    engine, processor, model_key, prompt, image
                ).strip()
                answers.append({"question": q["text"], "answer": text})

        # strategy in the name: the reference's timestamp-only scheme
        # (pope_test.py:255-256) silently overwrites same-second runs
        ans_path = os.path.join(ans_dir, f"{run_stamp}_{strategy}_ans.json")
        with open(ans_path, "w") as f:
            for a in answers:
                f.write(json.dumps(a) + "\n")
        # sidecar keeps the answers file format-identical to the
        # reference's archives while linking it to its question snapshot
        with open(ans_path.replace("_ans.json", "_ans.meta.json"), "w") as f:
            json.dump(
                {"question_snapshot": snap_dir, "strategy": strategy,
                 "n": len(answers)}, f,
            )
        print(f"Answer file: {ans_path}")
        scores = score_answers(answers, [q["label"] for q in questions[:n]])
        print_scores(scores)


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, default="llava")
    p.add_argument("--model-path", type=str, required=True)
    p.add_argument("--coco-data-dir", type=str, required=True)
    p.add_argument("--pope-dir", type=str, default="./pope_out")
    p.add_argument("--original", type=str2bool, default=False)
    p.add_argument("--refresh-data", type=str2bool, default=False)
    p.add_argument("--number", type=int, default=3000)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--avg", type=str2bool, default=False)
    p.add_argument("--voting-numbers", type=int, default=3)
    p.add_argument("--use_random", type=str2bool, default=False)
    p.add_argument(
        "--quantize",
        type=str,
        default=None,
        choices=[None, "int8", "w8a8", "int4"],
        help="LM tower quantization; 'w8a8' additionally runs prefill "
        "projections on the int8 MXU — the POPE workload is pure prefill "
        "(max_new_tokens=1), so this is its main latency lever (1.41x "
        "device prefill at 7B depth)",
    )
    p.add_argument("--int8-kv", type=str2bool, default=False,
                   help="int8-quantized KV cache")
    p.add_argument("--int8-prefix-cache", type=str2bool, default=False,
                   help="store --prefix-cache handles int8-quantized: "
                   "half the resident bytes per cached image at a "
                   "measured 12-24% slower extend (memory/speed trade)")
    p.add_argument(
        "--batch-size",
        type=int,
        default=1,
        help="questions per device batch (all model families): POPE is pure "
        "prefill, and variable-length questions are right-padded with "
        "per-row lengths — amortizes the vision tower + dispatch across "
        "the batch",
    )
    p.add_argument(
        "--prefix-cache",
        type=str2bool,
        default=False,
        help="prefill the shared [text-prefix + image] span ONCE per "
        "image and run each question as a short extension over the "
        "cached KV (POPE asks ~6 questions per image; the prefix is "
        "~580 of ~615 merged tokens at LLaVA-1.5 shapes, ~2,900 of "
        "~2,930 at LLaVA-NeXT's).  Numerically identical to the full "
        "probe.  --model llava / llava-next (InstructBLIP's Q-Former "
        "reads the question, so no shared LM prefix exists — use "
        "--batch-size, which dedupes its ViT per unique image)",
    )
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
