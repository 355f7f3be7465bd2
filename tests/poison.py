"""Shared NaN/±Inf fixture poisoning — used by the NaN/Inf boundary
audit (tests/test_naninf_inputs.py) and the observe-metric totality
contract (tests/test_observe_totality.py), and importable from the
subprocess the latter spawns (``python -m tests.poison <src> <dst>``).

Every scalar-double column and every float-array column gets NaN,
+Inf, -Inf sprinkled on every 10th row — the same poison recipe the
r11 audit used to find the ~50-query CAST_OVERFLOW blast radius and
the observe-metric driver hang.
"""

from __future__ import annotations

import os

SPECIALS = (float("nan"), float("inf"), float("-inf"))


def poison_tables(src_dir: str, dst_dir: str) -> None:
    """Copy every parquet fixture from ``src_dir`` into ``dst_dir``
    with non-finite doubles injected on every 10th row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst_dir, exist_ok=True)
    for f in os.listdir(src_dir):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(src_dir, f))
        n = t.num_rows
        cols = []
        for i, field in enumerate(t.schema):
            col = t.column(i).combine_chunks()
            if pa.types.is_float64(field.type) and n:
                vals = col.to_pylist()
                for j in range(0, n, 10):
                    vals[j] = SPECIALS[(j // 10) % 3]
                col = pa.array(vals, type=field.type)
            elif (
                pa.types.is_list(field.type)
                and pa.types.is_floating(field.type.value_type)
                and n
            ):
                vals = col.to_pylist()
                for j in range(0, n, 10):
                    if vals[j]:
                        vals[j] = list(vals[j])
                        vals[j][0] = SPECIALS[(j // 10) % 3]
                col = pa.array(vals, type=field.type)
            cols.append(col)
        pq.write_table(pa.table(cols, schema=t.schema), os.path.join(dst_dir, f))


if __name__ == "__main__":
    import sys

    poison_tables(sys.argv[1], sys.argv[2])
