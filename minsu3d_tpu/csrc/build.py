"""Build the native host library: python -m minsu3d_tpu.csrc.build"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def build() -> str:
    src = os.path.join(HERE, "host_ops.cpp")
    out = os.path.join(HERE, "libminsu3d_host.so")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", out, src]
    print(" ".join(cmd))
    subprocess.check_call(cmd)
    return out


if __name__ == "__main__":
    path = build()
    sys.path.insert(0, os.path.join(HERE, "..", ".."))
    from minsu3d_tpu.csrc import native

    print("built:", path, "loadable:", native.available())
