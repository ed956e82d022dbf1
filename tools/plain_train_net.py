#!/usr/bin/env python
"""Train / evaluate MonoFlex-TPU (reference CLI parity: tools/plain_train_net.py).

Examples:
    python tools/plain_train_net.py --config runs/monoflex.yaml --batch_size 8
    python tools/plain_train_net.py --config runs/monoflex.yaml --eval --ckpt <dir>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "MONOFLEX_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))

from monoflex_tpu.cli import main

if __name__ == "__main__":
    main()
