"""Config system: a small HOCON-subset parser + typed access.

The reference drives every workload from pyhocon `.conf` files
(`/root/reference/conf/*.conf`, parsed at `mesh_sfs_optim.py:31`). Those
files only use the `key = value` subset of HOCON (plus `#`/`//` comments),
so this parser covers exactly that and keeps the same key names; `Config`
mirrors the `get_int/get_float/get_string` accessors the reference calls
(`mesh_sfs_optim.py:49-65`).
"""

from __future__ import annotations

import dataclasses
from typing import Any


def _parse_value(raw: str) -> Any:
    raw = raw.strip()
    if raw.startswith('"') and raw.endswith('"') and len(raw) >= 2:
        return raw[1:-1]
    low = raw.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        pass
    return raw


def parse_hocon(text: str) -> dict:
    out: dict[str, Any] = {}
    for line in text.splitlines():
        # strip comments (# and //), but not inside quotes
        stripped = ""
        in_q = False
        i = 0
        while i < len(line):
            c = line[i]
            if c == '"':
                in_q = not in_q
            if not in_q and (c == "#" or line[i : i + 2] == "//"):
                break
            stripped += c
            i += 1
        stripped = stripped.strip()
        if not stripped or "=" not in stripped:
            continue
        key, _, val = stripped.partition("=")
        out[key.strip()] = _parse_value(val)
    return out


@dataclasses.dataclass
class Config:
    values: dict

    def get_int(self, key: str, default=None) -> int:
        return int(self._get(key, default))

    def get_float(self, key: str, default=None) -> float:
        return float(self._get(key, default))

    def get_string(self, key: str, default=None) -> str:
        return str(self._get(key, default))

    def get_bool(self, key: str, default=None) -> bool:
        v = self._get(key, default)
        if isinstance(v, str):
            return v.lower() == "true"
        return bool(v)

    def get_list(self, key: str, default=None, sep=",") -> list:
        v = self._get(key, default)
        if isinstance(v, str):
            return [s for s in v.split(sep) if s]
        return list(v)

    def _get(self, key, default):
        if key in self.values:
            return self.values[key]
        if default is not None:
            return default
        raise KeyError(f"config key {key!r} missing and no default given")

    def __contains__(self, key):
        return key in self.values


def load_config(path: str) -> Config:
    with open(path) as f:
        return Config(parse_hocon(f.read()))
