#!/usr/bin/env python
"""Thin entry point mirroring ref:train_dncnn_noiseflow.py.

The real driver lives in noise_flow_tpu.cli.train_dncnn.
"""

import sys

from noise_flow_tpu.cli.train_dncnn import main

if __name__ == "__main__":
    sys.exit(main())
