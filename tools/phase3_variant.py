"""Run a bench-phase3-style KITTI-00 full-sequence measurement with extra
CLI args (filter/realism A/Bs), honoring bench.py's first-readback
discipline so stream rates are trustworthy on the relay.

Usage: python tools/phase3_variant.py OUTDIR [extra cli args...]
"""

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import KITTI00_GT, pay_first_readback  # noqa: E402
from xchu_slam_tpu.cli import main as cli_main  # noqa: E402
from xchu_slam_tpu.utils import compile_cache  # noqa: E402


def main() -> None:
    compile_cache.enable()
    outdir = sys.argv[1]
    extra = sys.argv[2:]
    probe = pay_first_readback()
    t0 = time.perf_counter()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli_main(["run-sim", "--trajectory", KITTI00_GT, "--scans", "4541",
                  "--engine", "device", "--out", outdir] + extra)
    s = json.loads(buf.getvalue())
    s["wall_s"] = round(time.perf_counter() - t0, 1)
    s["relay_probe"] = probe
    s["cli_extra_args"] = extra
    print(json.dumps(s))


if __name__ == "__main__":
    main()
