"""Build the native library: ``python -m enph459_super_resolution_tpu.native.build``."""

from __future__ import annotations

import os
import subprocess
import sys


def build(verbose: bool = True) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "png_loader.cpp")
    out = os.path.join(here, "libsrpng.so")
    cmd = ["g++", "-O2", "-fPIC", "-shared", "-std=c++17", src, "-lpng",
           "-lpthread", "-o", out]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


def main(argv=None) -> int:
    path = build()
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from enph459_super_resolution_tpu.native import png_loader

    png_loader._TRIED = False  # force re-probe after build
    print("built:", path, "loadable:", png_loader.available())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
