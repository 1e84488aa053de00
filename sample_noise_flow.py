#!/usr/bin/env python
"""Thin entry point mirroring the reference's ref:sample_noise_flow.py demo.

The real driver lives in noise_flow_tpu.cli.sample.
"""

import sys

from noise_flow_tpu.cli.sample import main

if __name__ == "__main__":
    sys.exit(main())
