#!/usr/bin/env python
"""Thin entry point mirroring the reference's ref:train_noise_flow.py CLI.

The real driver lives in noise_flow_tpu.cli.train; this wrapper keeps the
canonical invocation `python train_noise_flow.py --arch "sdn5|..."` working.
"""

import sys

from noise_flow_tpu.cli.train import main

if __name__ == "__main__":
    sys.exit(main())
