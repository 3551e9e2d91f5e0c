#!/usr/bin/env python
"""Run any benchmark case end-to-end — the `roslaunch GIE <case>.launch`
equivalent (reference README.md:106-145).

Thin shim over :mod:`gie_mapping_tpu.cli` (kept so documented
`python examples/run_case.py ...` invocations and the bench harnesses keep
working; the installed console script is `gie-tpu-run`).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gie_mapping_tpu.cli import main, replay_frames, synthetic_frames  # noqa: F401,E402

if __name__ == "__main__":
    main()
