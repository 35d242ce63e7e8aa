"""Build the native image pipeline (g++ + libjpeg) into native/build/.

Called lazily from dropoutdecoding_tpu.utils.native_image; safe to run
standalone:  python native/build.py
"""
from __future__ import annotations

import os
import subprocess

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "ddtpu_image.cpp")
OUT_DIR = os.path.join(HERE, "build")
OUT = os.path.join(OUT_DIR, "libddtpu_image.so")


def build(force: bool = False) -> str | None:
    """Compile if needed; returns the .so path or None on failure."""
    if not force and os.path.exists(OUT) and os.path.getmtime(OUT) >= os.path.getmtime(SRC):
        return OUT
    os.makedirs(OUT_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        SRC, "-o", OUT, "-ljpeg",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return OUT
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        print(f"native build failed (falling back to PIL): {msg}")
        return None


if __name__ == "__main__":
    path = build(force=True)
    print("built:", path)
