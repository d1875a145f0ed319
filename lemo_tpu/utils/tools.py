"""Small shared helpers (human_body_prior/tools/omni_tools.py capability:
copy2cpu, makepath, log2file, id_generator)."""

from __future__ import annotations

import os
import random
import string

import numpy as np


def copy2cpu(x) -> np.ndarray:
    """Device array (or pytree leaf) -> host numpy."""
    return np.asarray(x)


def makepath(path: str, isfile: bool = False) -> str:
    """Create the directory (or the file's parent directory)."""
    d = os.path.dirname(path) if isfile else path
    if d:
        os.makedirs(d, exist_ok=True)
    return path


class log2file:
    """Minimal file logger callable: log2file('run.log')('message')."""

    def __init__(self, logpath: str | None = None, prefix: str = ""):
        self.fhandle = open(makepath(logpath, isfile=True), "a") \
            if logpath else None
        self.prefix = prefix

    def __call__(self, text: str) -> None:
        msg = f"{self.prefix}{text}"
        print(msg)
        if self.fhandle:
            self.fhandle.write(msg + "\n")
            self.fhandle.flush()


def id_generator(size: int = 13) -> str:
    chars = string.ascii_uppercase + string.digits
    return "".join(random.choice(chars) for _ in range(size))
