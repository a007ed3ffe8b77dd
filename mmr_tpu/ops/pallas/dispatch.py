"""Per-shape kernel dispatch table (packed conv vs XLA).

``benchmarks/bench_conv_kernel.py`` times both paths per conv shape on the
real chip and writes ``conv_table.json`` next to this file; the conv op
consults it at trace time. Shapes not in the table fall back to a heuristic
fitted to the v5e measurements: XLA's materialized-im2col lowering loses to
the packed kernel whenever the image is big enough to be traffic-bound and
the packing waste is moderate.
"""

from __future__ import annotations

import functools
import json
from pathlib import Path

_TABLE_PATH = Path(__file__).with_name("conv_table.json")


@functools.lru_cache(maxsize=1)
def _table() -> dict:
    if _TABLE_PATH.exists():
        return json.loads(_TABLE_PATH.read_text())
    return {}


def shape_key(h: int, w: int, cin: int, cout: int) -> str:
    return f"{h}x{w}x{cin}->{cout}"


def use_packed(h: int, w: int, cin: int, cout: int, pln: dict) -> bool:
    entry = _table().get(shape_key(h, w, cin, cout))
    if entry is not None:
        return bool(entry.get("packed_wins"))
    waste = (pln["cp"] / cin) * (pln["cop"] / cout) * pln["p"]
    return h * w >= 64 * 64 and waste <= 16


def record(results: dict) -> None:
    """Merge autotune results into the table (benchmark-side helper)."""
    table = dict(_table())
    table.update(results)
    _TABLE_PATH.write_text(json.dumps(table, indent=1, sort_keys=True))
    _table.cache_clear()
