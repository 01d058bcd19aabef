"""Per-event retry with backoff — the ST1 stateful retry machine, re-done
as the checkpoint-friendly retry-topic pattern.

Reference (/root/reference/typebus-kafka/.../KafkaBus.scala:204-240): a
``statefulMapConcat`` keeps per-eventId ``(attempt, RetryPolicy)`` in an
unbounded in-memory HashMap; ``Recoverable`` failures are re-injected via a
16-element ``dropHead`` queue after None/Linear/Exponential backoff
(bus/package.scala:19-29); exceeding ``retry`` attempts commits & drops.

Spark re-expression: failed rows are *published* to a per-stream retry
topic carrying ``attempt`` and ``not_before`` in ``meta.extra``; the
source unions the retry topic and dispatches rows whose ``not_before`` has
passed, re-publishing the rest. State therefore lives on the bus + in the
checkpoint — no unbounded driver/executor dict (the reference's known
leak, SURVEY.md §7 risks), nothing is load-shed, and a crash replays from
the checkpoint instead of dropping the queue. Deliberate, strictly
stronger divergence; documented here.

Failure marking: vectorized handlers signal per-row failure via a nullable
``_error`` string column (expression handlers: ``F.when(...)``; Python
handlers: the ``row_handler`` wrapper catches exceptions into it) — the
``Recoverable`` analog (event/package.scala:171).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from typebus_spark.registry import RetryPolicy

ERROR_COL = "_error"
ATTEMPT_KEY = "attempt"
NOT_BEFORE_KEY = "not_before_epoch"


def retry_topic(in_fqn: str) -> str:
    return f"{in_fqn}.retry"


def split_failures(out: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(succeeded, failed) by the ``_error`` convention; succeeded rows drop
    the marker column."""
    if ERROR_COL not in out.columns:
        return out, None  # type: ignore[return-value]
    ok_cond, bad_cond = _split_conds()
    ok = out.filter(ok_cond).drop(ERROR_COL)
    bad = out.filter(bad_cond)
    return ok, bad


def attempt_col() -> F.Column:
    """Current attempt number from meta.extra (0 on first delivery)."""
    return F.coalesce(
        F.col("meta.extra").getItem(ATTEMPT_KEY).cast("int"), F.lit(0)
    )


def backoff_seconds_col(policy: RetryPolicy, attempt: F.Column) -> F.Column:
    """Columnar form of RetryPolicy.backoff_seconds
    (KafkaBus.scala:223-233): delay / attempt*delay / attempt²*delay."""
    d = F.lit(policy.delay_seconds)
    if policy.shape.value == "linear":
        return attempt * d
    if policy.shape.value == "exponential":
        return (attempt * attempt) * d
    return d


def backoff_rounds(policy: RetryPolicy, attempt: int, clock_step: int) -> int:
    """How many ``clock_step``-sized drain rounds the backoff before
    retry number ``attempt`` spans — the scalar twin of the
    ``_retry_parts`` backoff SQL (same next-attempt semantics: a row
    failing its a-th time gets backoff(a); the SQL truncates the delay
    to long while this ceils the float, so the scalar can only OVER-
    estimate — safe for ``runtime._drain_round_bound``'s upper bound).
    Tests pin scalar == columnar per shape."""
    import math

    d = policy.backoff_seconds(attempt)
    return max(1, math.ceil(d / max(1, clock_step)))


from functools import lru_cache

# Constant SQL fragments for the retry meta update, parsed JVM-side in
# ONE py4j round-trip each instead of the ~50 a python-built
# map_filter-lambda tree costs — this runs once per drain ROUND, and the
# per-call build time was a measured driver hotspot.
_NXT_SQL = f"(coalesce(cast(meta.extra['{ATTEMPT_KEY}'] as int), 0) + 1)"


@lru_cache(maxsize=64)
def _retry_parts(policy: RetryPolicy) -> tuple:
    """(eligible_cond, gaveup_cond, kept_extra_map, next_attempt_str,
    backoff_seconds_long) — pure, policy-keyed expression trees."""
    if policy.shape.value == "linear":
        backoff_sql = f"({_NXT_SQL} * {policy.delay_seconds!r})"
    elif policy.shape.value == "exponential":
        backoff_sql = f"({_NXT_SQL} * {_NXT_SQL} * {policy.delay_seconds!r})"
    else:
        backoff_sql = repr(policy.delay_seconds)
    return (
        F.expr(f"{_NXT_SQL} <= {policy.max_attempts}"),
        F.expr(f"{_NXT_SQL} > {policy.max_attempts}"),
        F.expr(
            "map_filter("
            "coalesce(meta.extra, cast(map() as map<string,string>)), "
            f"(k, v) -> k NOT IN ('{ATTEMPT_KEY}', '{NOT_BEFORE_KEY}'))"
        ),
        F.expr(f"cast({_NXT_SQL} as string)"),
        F.expr(f"cast({backoff_sql} as long)"),
    )


@lru_cache(maxsize=128)
def _payload_struct(payload_cols: tuple) -> F.Column:
    return F.struct(*[F.col(c) for c in payload_cols]).alias("payload")


@lru_cache(maxsize=2)
def _split_conds() -> tuple:
    """Static (ok, bad) filter conditions for the ``_error`` convention —
    rebuilt per stream per drain round otherwise."""
    return (F.col(ERROR_COL).isNull(), F.col(ERROR_COL).isNotNull())


@lru_cache(maxsize=256)
def _retry_decoded_cols(
    policy: RetryPolicy, payload_cols: tuple, retry_t: str, now_key
) -> tuple:
    """The full (meta', payload, topic) projection for retry re-queue
    rows, keyed by (policy, payload shape, topic, pinned epoch). The
    meta-update tree (withField + map_concat) is ~25 py4j round trips
    and the drain loop rebuilt it per stream per ROUND; a drain pins one
    epoch so this caches across rounds. ``now_key=None`` = wall clock."""
    now_c = (
        F.lit(now_key)
        if now_key is not None
        else F.unix_timestamp(F.current_timestamp())
    )
    _, _, kept_map, nxt_str, backoff = _retry_parts(policy)
    new_meta = F.col("meta").withField(
        "extra",
        F.map_concat(
            kept_map,
            F.create_map(
                F.lit(ATTEMPT_KEY),
                nxt_str,
                F.lit(NOT_BEFORE_KEY),
                (now_c + backoff).cast("string"),
            ),
        ),
    )
    return (
        new_meta.alias("meta"),
        _payload_struct(payload_cols),
        F.lit(retry_t).alias("topic"),
    )


def retry_decoded(
    failed: DataFrame,
    in_fqn: str,
    policy: RetryPolicy,
    payload_cols: list[str],
    now: F.Column | int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Failed decoded rows → (DECODED retry rows, gave-up rows).

    Retry rows keep the ORIGINAL meta (same event_id — the retry state key,
    KafkaBus.scala:205) with ``extra.attempt`` incremented and
    ``extra.not_before_epoch`` = now + backoff(attempt). Rows past
    ``max_attempts`` are returned for dead-lettering (give-up path
    KafkaBus.scala:219-221).

    Output shape is the decoded-stream shape ``(meta, payload, topic)`` —
    an in-process drain loop feeds it straight back into the router
    without the encode→publish→decode JSON round-trip the durable bus
    path pays (see ``encode_retry`` for that form). ``now`` as an int (or
    None for wall clock) hits the cached projection; a Column falls back
    to a per-call build.
    """
    eligible_cond, gaveup_cond, kept_map, nxt_str, backoff = _retry_parts(
        policy
    )
    eligible = failed.filter(eligible_cond)
    gave_up = failed.filter(gaveup_cond)

    if now is None or isinstance(now, int):
        cols = _retry_decoded_cols(
            policy, tuple(payload_cols), retry_topic(in_fqn), now
        )
        return eligible.select(*cols), gave_up

    new_meta = F.col("meta").withField(
        "extra",
        F.map_concat(
            kept_map,
            F.create_map(
                F.lit(ATTEMPT_KEY),
                nxt_str,
                F.lit(NOT_BEFORE_KEY),
                (now + backoff).cast("string"),
            ),
        ),
    )
    decoded = eligible.select(
        new_meta.alias("meta"),
        _payload_struct(tuple(payload_cols)),
        F.lit(retry_topic(in_fqn)).alias("topic"),
    )
    return decoded, gave_up


def encode_retry(
    failed: DataFrame,
    in_fqn: str,
    policy: RetryPolicy,
    payload_cols: list[str],
    now: F.Column | int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Failed decoded rows → (retry-TOPIC bus rows, gave-up rows): the
    durable form of ``retry_decoded`` — same meta update, envelope
    re-encoded for publishing to the per-stream retry topic."""
    decoded, gave_up = retry_decoded(failed, in_fqn, policy, payload_cols, now)
    retry_rows = decoded.select(*_encode_retry_cols(retry_topic(in_fqn)))
    return retry_rows, gave_up


@lru_cache(maxsize=256)
def _encode_retry_cols(retry_t: str) -> tuple:
    return (
        F.lit(None).cast("binary").alias("key"),
        F.to_json(F.struct("meta", "payload")).cast("binary").alias("value"),
        F.lit(retry_t).alias("topic"),
    )


from functools import lru_cache


@lru_cache(maxsize=128)
def _eligibility_conds(now_key: int | None) -> tuple:
    """(eligible, not-yet) filter conditions for a pinned epoch (or wall
    clock when ``now_key`` is None). Cached: the drain loop rebuilds
    these per stream per round, ~10 py4j round-trips each."""
    now_c = (
        F.lit(now_key)
        if now_key is not None
        else F.unix_timestamp(F.current_timestamp())
    )
    nb = F.col("meta.extra").getItem(NOT_BEFORE_KEY).cast("long")
    return (nb.isNull() | (nb <= now_c), nb.isNotNull() & (nb > now_c))


def eligible_now(
    decoded: DataFrame, now_epoch: F.Column | int | None = None
) -> DataFrame:
    """Rows whose backoff has elapsed (source-side filter on the unioned
    retry stream — the ``merge(retryQueueSource)`` analog,
    KafkaBus.scala:188-197)."""
    if now_epoch is None or isinstance(now_epoch, int):
        return decoded.filter(_eligibility_conds(now_epoch)[0])
    nb = F.col("meta.extra").getItem(NOT_BEFORE_KEY).cast("long")
    return decoded.filter(nb.isNull() | (nb <= now_epoch))


def not_yet_eligible(
    decoded: DataFrame, now_epoch: F.Column | int | None = None
) -> DataFrame:
    if now_epoch is None or isinstance(now_epoch, int):
        return decoded.filter(_eligibility_conds(now_epoch)[1])
    nb = F.col("meta.extra").getItem(NOT_BEFORE_KEY).cast("long")
    return decoded.filter(nb.isNotNull() & (nb > now_epoch))


def row_handler(
    fn: Callable[[dict], dict | None],
    out_fields: list[tuple[str, str]],
) -> Callable[[DataFrame], DataFrame]:
    """Wrap a per-record Python handler ``dict -> dict`` as an Arrow-batched
    ``mapInPandas`` transform that catches exceptions into ``_error`` —
    the vectorized upgrade of the per-record ``Future`` handler (T1) with
    ``Recoverable`` capture (C2 never-stop supervision analog).

    ``out_fields``: [(name, spark_ddl_type)] of the handler's output.
    UDF escape hatch only — expression handlers stay JVM-side and faster.
    """

    def transform(df: DataFrame) -> DataFrame:
        in_schema = df.schema
        out_ddl = (
            ", ".join(f"{n} {t}" for n, t in out_fields) + f", {ERROR_COL} string"
        )
        meta_idx = [f.name for f in in_schema.fields]

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out_rows = []
                for rec in pdf.to_dict("records"):
                    try:
                        r = fn(rec) or {}
                        r[ERROR_COL] = None
                    except Exception as e:  # Recoverable capture
                        r = {n: rec.get(n) for n, _ in out_fields}
                        r[ERROR_COL] = f"{type(e).__name__}: {e}"
                    r["meta"] = rec.get("meta")
                    out_rows.append(r)
                yield pd.DataFrame(
                    out_rows,
                    columns=["meta"] + [n for n, _ in out_fields] + [ERROR_COL],
                )

        meta_ddl = next(
            f"meta {f.dataType.simpleString()}"
            for f in in_schema.fields
            if f.name == "meta"
        )
        _ = meta_idx
        return df.mapInPandas(run, schema=f"{meta_ddl}, {out_ddl}")

    return transform


def drop_head(
    df: DataFrame,
    size: int,
    order_by: F.Column | str,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """akka-streams ``buffer(size, OverflowStrategy.dropHead)`` analog:
    keep the NEWEST ``size`` rows (highest ``order_by``), silently shed
    the rest — the reference attaches exactly this 16-element dropHead
    buffer to the retry re-injection stream (KafkaBus.scala:186-189) as
    its back-pressure escape valve under overload.

    Global form: ``orderBy(desc).limit(size)`` compiles to
    TakeOrderedAndProject — O(size) state per partition plus one tiny
    merge, never a cluster-wide sort. Keyed form: rank window, which
    Catalyst executes with WindowGroupLimit (per-map-partition pruning
    to ``size`` rows per key BEFORE the exchange).
    """
    order = F.col(order_by) if isinstance(order_by, str) else order_by
    if not partition_by:
        return df.orderBy(order.desc()).limit(size)
    from pyspark.sql import Window

    w = Window.partitionBy(*partition_by).orderBy(order.desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= size)
        .drop("_rn")
    )
