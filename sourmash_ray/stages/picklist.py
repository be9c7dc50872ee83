"""Picklist filtering with the reference's column-type registry.

Mirrors ``/root/reference/src/sourmash/picklist.py:20-52`` (vectorized):
each *coltype* is a preprocessing of the collection's key column before
set membership, include/exclude style. The picked-value set is small by
construction (a CSV / driver-side list), so it broadcasts via ``ray.put``
and each batch filters with one ``pc.is_in`` — never a shuffle join.

Coltypes (``picklist.py:20-31``):
- ``name`` / ``md5``: exact match
- ``ident``: first space-delimited token of the name
- ``identprefix``: ident truncated at the first '.'
- ``md5prefix8`` / ``md5short``: first 8 characters
- ``manifest``/``gather``/``prefetch``/``search`` meta-coltypes
  (``picklist.py:35-46``): composite (ident, md5short) key — expressed
  here as the joined string ``ident + '|' + md5short`` on both sides.
"""
from __future__ import annotations

from enum import Enum

import pyarrow as pa
import pyarrow.compute as pc

import ray


class PickStyle(Enum):
    INCLUDE = 1
    EXCLUDE = 2


def _first_token(col: pa.Array) -> pa.Array:
    return pc.list_element(
        pc.split_pattern(col, " ", max_splits=1), 0)


def _ident(col: pa.Array) -> pa.Array:
    return _first_token(col)


def _identprefix(col: pa.Array) -> pa.Array:
    return pc.list_element(
        pc.split_pattern(_first_token(col), ".", max_splits=1), 0)


def _md5short(col: pa.Array) -> pa.Array:
    return pc.utf8_slice_codeunits(col, 0, 8)


PREPROCESS = {
    "name": lambda c: c,
    "md5": lambda c: c,
    "ident": _ident,
    "identprefix": _identprefix,
    "md5prefix8": _md5short,
    "md5short": _md5short,
}

META_COLTYPES = ("manifest", "gather", "prefetch", "search")


def preprocess_column(col: pa.Array, coltype: str) -> pa.Array:
    if coltype not in PREPROCESS:
        raise ValueError(f"unsupported picklist coltype: {coltype!r} "
                         f"(supported: {sorted(PREPROCESS)})")
    return PREPROCESS[coltype](col)


def combine_ident_md5(name_col: pa.Array, md5_col: pa.Array) -> pa.Array:
    """``picklist.py:35-41``: (name, md5) → 'ident|md5short' key."""
    return pc.binary_join_element_wise(
        pc.cast(_ident(name_col), pa.string()),
        _md5short(md5_col), "|")


def picklist_filter(ds, column: str, values, coltype: str = "name",
                    style: PickStyle = PickStyle.INCLUDE,
                    md5_column: str | None = None):
    """Filter a Dataset by picklist membership on a preprocessed column.

    ``values``: iterable of picked strings (already in the coltype's
    preprocessed form, as in the reference's pickfile CSV). For
    meta-coltypes pass 'ident|md5short' strings and both ``column``
    (name) and ``md5_column``.
    """
    vals_ref = ray.put(pa.array(sorted(set(values)), pa.string()))
    include = style == PickStyle.INCLUDE
    meta = coltype in META_COLTYPES

    def _filter(batch: pa.Table) -> pa.Table:
        vals = ray.get(vals_ref)
        if meta:
            key = combine_ident_md5(batch[column].combine_chunks(),
                                    batch[md5_column].combine_chunks())
        else:
            key = preprocess_column(
                pc.cast(batch[column].combine_chunks(), pa.string()),
                coltype)
        mask = pc.is_in(key, value_set=vals)
        if not include:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(_filter, batch_format="pyarrow")
