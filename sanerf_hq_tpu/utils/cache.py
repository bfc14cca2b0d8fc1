"""Ring-buffer cache for stage-2 online distillation.

Reference: nerf/utils.py:353-369 — fixed-size FIFO ring holding recent
(rays, gt-feature) training samples so the HQ-SAM encoder only runs every
cache_interval steps (nerf/trainer.py:339-346)."""
from __future__ import annotations

import random
from typing import Any, List, Optional


class Cache:
    def __init__(self, size: int = 100):
        self.size = size
        self.data: List[Any] = []
        self.ptr = 0

    def full(self) -> bool:
        return len(self.data) == self.size

    def insert(self, x):
        if len(self.data) < self.size:
            self.data.append(x)
        else:
            self.data[self.ptr] = x
            self.ptr = (self.ptr + 1) % self.size

    def get(self):
        return random.choice(self.data)

    def __len__(self):
        return len(self.data)
