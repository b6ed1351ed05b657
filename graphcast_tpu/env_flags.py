"""Centralized boolean environment knobs.

One parser for every GC_* A/B flag (ADVICE r4: three different inline
``os.environ`` idioms across graphcast.py / denoiser.py / pallas_edge.py
made the A/B surface easy to drift, and plain truthiness treats "0"/"false"
as ON). Only "1"/"true"/"yes"/"on" enable a flag; unset, "", "0", "false",
"no", "off" disable it; anything else raises instead of silently picking a
side.
"""

from __future__ import annotations

import os

_TRUE = ("1", "true", "yes", "on")
_FALSE = ("", "0", "false", "no", "off")


def env_flag(name: str, default: bool = False) -> bool:
  val = os.environ.get(name)
  if val is None:
    return default
  val = val.strip().lower()
  if val in _TRUE:
    return True
  if val in _FALSE:
    return False
  raise ValueError(f"unrecognized boolean value {name}={val!r} "
                   f"(use one of {_TRUE + _FALSE})")
