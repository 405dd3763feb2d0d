#!/usr/bin/env python
"""Repo-root launcher for the demo app (see poissbox_tpu/demo.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from poissbox_tpu.demo import main

if __name__ == "__main__":
    sys.exit(main())
