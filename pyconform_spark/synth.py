"""Deterministic, Spark-native synthetic ``transcripts`` generator.

Role model: the reference test-fixture generator ``DataMaker``
(``/root/reference/source/test/makeTestData.py:18-135``) — seeded,
parameterized synthetic inputs — rebuilt so generation itself is a
distributed, fully-columnar Spark job:

* NO driver-side data loop and NO Python UDF: conversations come from
  ``spark.range(n_convs)``, turns from a two-level ``explode(sequence)``
  (chunked so no single row materializes a giant array), and every
  attribute is a closed-form arithmetic hash of ``(conv_id, turn_idx)``.
  The same closed forms are reproduced in numpy by the pandas oracle
  (``pyconform_spark.oracle``), which is what makes bit-for-bit parity
  testable without shipping data anywhere.
* Zipf-ish conversation sizes — a few hot conversations dominate, which
  is exactly the skew the engine's salting path must handle (reference
  analog: byte-weighted static partitioning, ``dataflow.py:282-296``).
* Timestamps are strictly increasing per conversation WITHOUT a window
  cumsum: ``ts = start + i*STEP + floor(i/gap_every)*gap_len + jitter``
  with ``jitter < STEP``.  The ``floor(i/gap_every)*gap_len`` term
  injects known gaps (missing buckets) to exercise gap-fill
  (reference analog: ``mapdates.py:112-216`` gap checks).

All arithmetic stays below 2^63 so Spark LongType and numpy int64 agree
exactly. The PRNG is a 32-bit LCG chain (glibc constants), applied
twice per field with distinct salts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z
# Agent transcripts turn over in seconds (tool call / result / next
# prompt), so the 1m tier genuinely aggregates multiple turns per
# bucket — which is also what gives the map-side partial agg real
# shuffle reduction at scale.
STEP_SECONDS = 6         # nominal inter-turn cadence
MAX_JITTER = 5           # < STEP_SECONDS => per-conv timestamps strictly increase
CHUNK = 4096             # max sequence() length per exploded row

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["bash", "edit", "read", "grep", "glob", "web", "task", "notebook"]

REP_MOD = 8  # text filler repeats ~ U(0,7)*U(0,6) => ~280B avg text
_M32 = 4294967296  # 2**32
_A = 1103515245
_C = 12345


def _mix(x: Column, salt: int) -> Column:
    """Two rounds of a 32-bit LCG; input folded mod 2^32 first so every
    intermediate product stays < 2^63 (exact in int64/LongType)."""
    x = (x % _M32 + salt) % _M32
    x = (x * _A + _C) % _M32
    x = (x * _A + _C) % _M32
    return x


def _turn_key(conv: Column, idx: Column) -> Column:
    # Injective fold of (conv, idx) into < 2^53 before mixing.
    return conv * F.lit(1048576) + idx  # idx < 2^20 per conv cap


def conv_plan(spark: SparkSession, n_turns: int) -> DataFrame:
    """Conversation-level plan: (conv, n_conv_turns, start_off, gap_every,
    gap_len).  Sizes follow ``size ~ S0 / (conv+1)^0.7`` (Zipf-ish,
    hot head), floored at 4 turns.
    """
    avg = 24
    n_convs = max(1, n_turns // avg) if n_turns > 0 else 0
    # S0 chosen so sum(S0 * r^-0.7) ~= n_turns  (integral approx:
    # sum r^-0.7 ~ n^0.3 / 0.3).
    s0 = n_turns * 0.3 / max(n_convs, 2) ** 0.3
    df = spark.range(n_convs).withColumnRenamed("id", "conv")
    size = F.greatest(
        F.lit(4),
        F.floor(F.lit(s0) / F.pow(F.col("conv") + 1, F.lit(0.7))),
    ).cast("long")
    # Hard cap keeps the turn key injective and bounds any one series.
    size = F.least(size, F.lit(1 << 20))
    return df.select(
        "conv",
        size.alias("n_conv_turns"),
        (_mix(F.col("conv"), 101) % 86400).alias("start_off"),
        (F.lit(20) + _mix(F.col("conv"), 202) % 30).alias("gap_every"),
        (F.lit(1800) + _mix(F.col("conv"), 303) % 7200).alias("gap_len"),
    )


def transcripts(spark: SparkSession, n_turns: int = 60_000) -> DataFrame:
    """Build the transcripts DataFrame (~n_turns rows), fully columnar.

    Two-level explode: conversations → fixed-size chunks → turn indices,
    so no row ever holds more than CHUNK array elements regardless of
    how hot a conversation is (scale-safe at 10^12 turns, where the hot
    head can reach the per-conv cap).
    """
    plan = conv_plan(spark, n_turns)

    chunks = plan.select(
        "*",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.floor((F.col("n_conv_turns") - 1) / CHUNK).cast("long"),
            )
        ).alias("chunk"),
    )
    turns = chunks.select(
        "*",
        F.explode(
            F.sequence(
                F.col("chunk") * CHUNK,
                F.least(
                    (F.col("chunk") + 1) * CHUNK - 1, F.col("n_conv_turns") - 1
                ),
            )
        ).alias("i"),
    )

    conv, i = F.col("conv"), F.col("i")
    tkey = _turn_key(conv, i)
    h_text = _mix(tkey, 7)
    h_tool = _mix(tkey, 11)
    h_jit = _mix(tkey, 13)

    ts_sec = (
        F.lit(BASE_EPOCH)
        + F.col("start_off")
        + i * STEP_SECONDS
        + F.floor(i / F.col("gap_every")) * F.col("gap_len")
        + h_jit % MAX_JITTER
    )

    # Deterministic pseudo-text: a tagged head + a repeated filler whose
    # repeat count is power-skewed; ~1/17 of turns are empty strings.
    n_rep = (h_text % REP_MOD) * (h_text % 7)
    text = F.when(h_text % 17 == 0, F.lit("")).otherwise(
        F.concat(
            F.lit("t"),
            h_text.cast("string"),
            F.lit(" "),
            F.repeat(F.lit("lorem ipsum dolor sit amet "), n_rep.cast("int")),
        )
    )

    tool_pick = h_tool % 10
    tool = (
        F.when(tool_pick == 8, F.lit(None).cast("string"))
        .when(tool_pick == 9, F.lit(""))
        .otherwise(
            F.element_at(
                F.array(*[F.lit(t) for t in TOOLS]), (tool_pick % 8 + 1).cast("int")
            )
        )
    )
    role = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]), (i % 4 + 1).cast("int")
    )

    return turns.select(
        F.concat(F.lit("conv-"), F.lpad(conv.cast("string"), 8, "0")).alias("conv_id"),
        i.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.timestamp_seconds(ts_sec).cast("timestamp_ntz").alias("ts"),
    )
