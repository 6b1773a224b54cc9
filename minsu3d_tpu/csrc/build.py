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


def ensure_built(quiet: bool = True) -> bool:
    """Build the host lib if absent (a fresh checkout has no .so — round-4's
    driver bench silently fell back to on-device plan builds, costing ~30%
    of the headline: plan 105 ms of a 471 ms scene). Returns availability."""
    from minsu3d_tpu.csrc import native

    if native.available():
        return True
    try:
        out = build()
        if quiet:
            print(f"# built native host lib: {out}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — graceful fallback to device plans
        print(f"# WARNING native host lib build failed ({e}); "
              "falling back to on-device plan builds", file=sys.stderr)
        return False
    native._TRIED = False  # retry the load now that the .so exists
    return native.available()


if __name__ == "__main__":
    path = build()
    sys.path.insert(0, os.path.join(HERE, "..", ".."))
    from minsu3d_tpu.csrc import native

    print("built:", path, "loadable:", native.available())
