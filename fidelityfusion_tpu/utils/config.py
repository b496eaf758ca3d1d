"""Config system: nested defaults with deep merging.

TPU-native re-design of the legacy config convention
(`MFGP_ver2023May/utils/dict_tools.py:3-10` ``update_dict_with_default``
and the per-module ``default_config`` dicts, `base_gp/cigp.py:14-17`):
one deep-merging helper + a frozen dot-access view, so model factories can
take nested config dicts with the legacy stack's ergonomics.  The
reference merge is shallow (one level); this one recurses (documented
upgrade).
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Mapping


def update_dict_with_default(default: Mapping, update: Mapping) -> Dict:
    """Deep-merge ``update`` over ``default`` (neither is mutated)."""
    out = copy.deepcopy(dict(default))
    for k, v in update.items():
        if (
            k in out
            and isinstance(out[k], Mapping)
            and isinstance(v, Mapping)
        ):
            out[k] = update_dict_with_default(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


class Config:
    """Read-only dot/bracket access over a nested dict."""

    def __init__(self, data: Mapping):
        self._data = dict(data)

    def __getattr__(self, name: str) -> Any:
        try:
            v = self._data[name]
        except KeyError as e:
            raise AttributeError(name) from e
        return Config(v) if isinstance(v, Mapping) else v

    def __getitem__(self, name: str) -> Any:
        v = self._data[name]
        return Config(v) if isinstance(v, Mapping) else v

    def get(self, name: str, default=None):
        v = self._data.get(name, default)
        return Config(v) if isinstance(v, Mapping) else v

    def to_dict(self) -> Dict:
        return copy.deepcopy(self._data)

    def __repr__(self):
        return f"Config({self._data!r})"


def make_config(default: Mapping, update: Mapping = None) -> Config:
    return Config(update_dict_with_default(default, update or {}))
