#!/usr/bin/env python
"""Thin entry point mirroring ref:test_dncnn_noiseflow.py.

The real driver lives in noise_flow_tpu.cli.test_dncnn.
"""

import sys

from noise_flow_tpu.cli.test_dncnn import main

if __name__ == "__main__":
    sys.exit(main())
