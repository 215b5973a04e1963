"""Update normalization: before/after images and CHANGED-column semantics.

Reference parity (Builder::processUpdate and the column-comparison loop,
/root/reference/src/builder/Builder.cpp:1425-1542; format knob
Format.h columnFormat FULL vs CHANGED):
  - each row version is compared to the PREVIOUS version of the same key;
  - unchanged columns are dropped from the update message (CHANGED mode);
  - key (PK) columns are always carried, even when a compared value is NULL
    (NULL vs value and NULL vs NULL compare with IS DISTINCT FROM, the
    reference's explicit null-flag handling);
  - the first sighting of a key is an insert (no before image).

Spark mapping: the "previous version" is `lag()` over a window keyed by the
PK and ordered by the version column — one shuffle on the key, everything
else is codegen'd column algebra. At 100 TB the window partitions by PK
(millions of small groups — the well-distributed regime); no state, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def before_after(
    df: DataFrame,
    key_cols: tuple[str, ...],
    order_cols: tuple[str, ...],
    value_cols: tuple[str, ...],
) -> DataFrame:
    """Normalize row versions into CDC-shaped change records.

    Output: key cols + order cols +
      op            'insert' (first version of key) | 'update' | 'noop'
      before        struct of previous values (all NULL for inserts)
      after         struct of current values
      changed_cols  array of column names whose value changed (IS DISTINCT
                    FROM — NULL-safe), in value_cols order; empty for
                    'insert' (no before image to diff) and 'noop'
      after_changed map<col, value-as-string> carrying ONLY changed columns —
                    the CHANGED-mode wire image (unchanged columns dropped).
                    A column changed TO NULL is present with a NULL value
                    (key present + NULL = value→NULL update; key absent =
                    unchanged — the reference emits changed-to-null columns
                    explicitly, Builder.cpp:1425-1542)
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    lags = {c: F.lag(c).over(w) for c in value_cols}
    rn = F.row_number().over(w)
    changed_flags = {
        c: lags[c].eqNullSafe(F.col(c)) == F.lit(False) for c in value_cols
    }
    changed_arr = F.filter(
        F.array(*[
            F.when(changed_flags[c], F.lit(c)) for c in value_cols
        ]),
        lambda x: x.isNotNull(),
    )
    any_changed = F.size(changed_arr) > 0
    op = (F.when(rn == 1, F.lit("insert"))
          .when(any_changed, F.lit("update"))
          .otherwise(F.lit("noop")))
    # membership is decided by the changed FLAG, not value nullness — a
    # map_filter on v.isNotNull() would silently drop value→NULL updates
    changed_entries = F.filter(
        F.array(*[
            F.struct(
                F.lit(c).alias("k"),
                changed_flags[c].alias("ch"),
                F.col(c).cast("string").alias("v"),
            )
            for c in value_cols
        ]),
        lambda e: e["ch"],
    )
    after_changed = F.map_from_arrays(
        F.transform(changed_entries, lambda e: e["k"]),
        F.transform(changed_entries, lambda e: e["v"]),
    )
    return df.select(
        *key_cols, *order_cols,
        op.alias("op"),
        F.struct(*[lags[c].alias(c) for c in value_cols]).alias("before"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("after"),
        F.when(rn == 1, F.array().cast("array<string>"))
        .otherwise(changed_arr).alias("changed_cols"),
        after_changed.alias("after_changed"),
    )
