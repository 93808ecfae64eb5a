"""Temporal joins: as-of (nearest-previous / nearest-next match).

The reference has no joins at all (single-input subprocess pipeline —
SURVEY.md §2.C); the as-of join is north-rule surface: the standard
event-enrichment shape ("attach the most recent prior state row to every
fact row") that a training-data/event pipeline hits constantly.

Scale design — the union+window formulation:
- Naive as-of is a pairwise inequality join (left × right per key) whose
  candidate set explodes on hot keys. Instead we UNION the two inputs,
  tagged, and run ONE window per key ordered by the time axis, carrying
  the last-seen right payload forward (`last(..., ignorenulls=True)`
  with ROWS UNBOUNDED PRECEDING).
- Cost: a single hash shuffle on the `by` key + an in-partition sort.
  No broadcast anywhere, no pairwise blow-up, both sides can be 100 TB.
  Skewed keys split by AQE; the window state is O(1) per row.
- Determinism at equal timestamps: right rows sort BEFORE left rows
  (inclusive backward match), and ties among right rows resolve by the
  `tiebreak` column so the carried payload is reproducible across
  partitionings.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | Sequence[str] = "user_id",
    right_cols: Sequence[str] = (),
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Attach to every `left` row the `right` row with the greatest
    `on` <= left.`on` (direction="backward"; "forward" = smallest >=)
    within the same `by` group. Left rows with no match keep NULLs
    (left-outer semantics).

    `on` must be a TimestampType column in both inputs. `right_cols` are
    the right-side payload columns to carry (emitted as `<col><suffix>`);
    the matched right timestamp is always emitted as `<on><suffix>` in
    epoch microseconds BIGINT (engine-stable). `tiebreak` orders right
    rows sharing an `on` value (largest wins); must exist in `right`.
    `tolerance_us` NULLs out matches further than that many microseconds
    from the left row.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    by_keys = [by] if isinstance(by, str) else list(by)
    left_payload = [c for c in left.columns if c not in by_keys]

    # parquet event times are TIMESTAMP_NTZ; unix_micros wants TIMESTAMP.
    # The session runs UTC, so the cast is value-preserving (same convention
    # as unix_timestamp elsewhere in the registry).
    t_us = F.unix_micros(F.col(on).cast("timestamp"))
    # backward: ascending time, right(_src=0) before left(1) at equal times
    # so the inclusive match is visible to last(). forward: negate the sort
    # keys instead of flipping every ordering clause.
    sign = 1 if direction == "backward" else -1
    tb = (F.col(tiebreak) if tiebreak is not None else F.lit(0)).cast("long")

    r = right.select(
        *[F.col(k) for k in by_keys],
        (t_us * sign).alias("_t"),
        F.lit(0).alias("_src"),
        (tb * sign).alias("_tb"),
        t_us.alias("_match_t"),
        *[F.col(c).alias(f"_p_{c}") for c in right_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left_payload],
    )
    l = left.select(
        *[F.col(k) for k in by_keys],
        (t_us * sign).alias("_t"),
        F.lit(1).alias("_src"),
        F.lit(0).cast("long").alias("_tb"),
        F.lit(None).cast("long").alias("_match_t"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}")
          for c in right_cols],
        *[F.col(c).alias(f"_l_{c}") for c in left_payload],
    )

    u = r.unionByName(l)
    w = (Window.partitionBy(*by_keys)
         .orderBy(F.col("_t").asc(), F.col("_src").asc(), F.col("_tb").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = u.select(
        *by_keys, "_t", "_src",
        F.last("_match_t", ignorenulls=True).over(w).alias(f"{on}{suffix}"),
        *[F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
          for c in right_cols],
        *[f"_l_{c}" for c in left_payload],
    ).where(F.col("_src") == 1)

    if tolerance_us is not None:
        gap = (F.col("_t") * sign - F.col(f"{on}{suffix}") if sign == 1
               else F.col(f"{on}{suffix}") - F.col("_t") * sign)
        in_tol = gap <= F.lit(int(tolerance_us))
        u = u.select(
            *by_keys, "_t", "_src",
            F.when(in_tol, F.col(f"{on}{suffix}")).alias(f"{on}{suffix}"),
            *[F.when(in_tol, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
              for c in right_cols],
            *[f"_l_{c}" for c in left_payload],
        )

    return u.select(
        *by_keys, f"{on}{suffix}",
        *[f"{c}{suffix}" for c in right_cols],
        *[F.col(f"_l_{c}").alias(c) for c in left_payload],
    )
