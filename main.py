#!/usr/bin/env python
"""Reference-parity CLI entry: `python main.py <path> [flags]`.

Same flag surface as the reference main.py; see sanerf_hq_tpu/cli.py.
"""
from sanerf_hq_tpu.cli import main

if __name__ == "__main__":
    main()
