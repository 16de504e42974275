"""Structured-Streaming runtime: run an application's parts as streaming
queries.

The reference runs each app as a chain of reactive-streams processors over
Kafka consumers/producers (App.java:758-791,1087-1104 — SURVEY.md §3.2).
Spark-first equivalent: the SAME compiled DataFrame lineage (plans/planner
compiles batch and streaming identically), executed as one streaming query
per sink:

  source (Kafka / file-stream / rate)
    -> compiled pipeline (operators/stages.py — stateless stages are
       mode-agnostic; $group runs in update output mode; $deduplicate maps
       to dropDuplicates[WithinWatermark])
    -> sink (Kafka / memory / foreachBatch)

Delivery: at-least-once with checkpointing, matching the reference's
contract (docs/index.md:3).  Kafka offsets ⇄ checkpoint state; the
reference's resume tokens (App.java:1056-1081) ⇄ checkpoint metadata.

Aggregate parts run ``applyInPandasWithState`` keyed by ``_id``: the
reference serializes commands per aggregate instance via Kafka key
partitioning (docs/state.md:114-127); grouped state processing is the
faithful distributed analogue (parallel across keys, ordered within one).
"""

from __future__ import annotations

import json
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pincette_json_streams_spark.operators.stages import (
    PipelineContext,
    compile_pipeline,
)

__all__ = [
    "kafka_source", "kafka_sink", "file_stream_catalog",
    "StreamingApp", "streaming_aggregate",
]


# --------------------------------------------------------------------------
# sources / sinks
# --------------------------------------------------------------------------

def kafka_source(
    spark: SparkSession,
    topic: str,
    bootstrap: str,
    schema: Optional[str] = None,
    max_offsets_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Kafka topic -> streaming DataFrame.  With a schema, the JSON value
    is parsed into typed columns plus the Kafka key as ``_key``; without
    one, rows are (``_key``, ``value`` JSON string) — the schemaless
    shape, accessed downstream via $stringToJson / get_json_object.
    ``maxOffsetsPerTrigger`` is the backpressure knob standing in for the
    reference's batchSize/batchTimeout (KafkaProvider.java:61-66)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger",
                               str(max_offsets_per_trigger))
    raw = reader.load().selectExpr(
        "CAST(key AS STRING) AS _key", "CAST(value AS STRING) AS value"
    )
    if schema is None:
        return raw
    return raw.select(
        "_key", F.from_json("value", schema).alias("v")
    ).select("_key", "v.*")


def kafka_sink(
    df: DataFrame,
    bootstrap: str,
    topic: Optional[str],
    checkpoint: str,
    key_col: str = "_id",
    output_mode: str = "append",
):
    """Streaming DataFrame -> Kafka.  Messages serialize as JSON of the
    whole row; a per-row ``topic`` column (from $send/$delay) takes
    precedence over the fixed topic — Kafka sinks route on it natively."""
    cols = [c for c in df.columns if c not in ("topic",)]
    out = df.select(
        *( [F.col("topic")] if "topic" in df.columns else [] ),
        (F.col(key_col).cast("string") if key_col in df.columns
         else F.lit(None).cast("string")).alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in cols])).alias("value"),
    )
    writer = (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if topic is not None and "topic" not in df.columns:
        writer = writer.option("topic", topic)
    return writer


def file_stream_catalog(
    spark: SparkSession,
    topic_dirs: dict[str, str],
    schemas: dict[str, str],
    max_files_per_trigger: Optional[int] = None,
) -> dict[str, DataFrame]:
    """Offline stand-in for Kafka: one parquet directory per topic
    (appends = new files).  Used by tests and local runs; the semantics —
    unbounded append source with checkpointed progress — match."""
    catalog = {}
    for name, d in topic_dirs.items():
        reader = spark.readStream.schema(schemas[name]).format("parquet")
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger",
                                   str(max_files_per_trigger))
        catalog[name] = reader.load(d)
    return catalog


# --------------------------------------------------------------------------
# streaming aggregate part  (docs/state.md — SURVEY.md §2.8)
# --------------------------------------------------------------------------

def streaming_aggregate(
    commands: DataFrame,
    agg_type: str,
    reducer_spec: Optional[dict] = None,
    order_col: Optional[str] = None,
    script_imports: Optional[dict] = None,
    unique_expression=None,
    part_preprocessor: Optional[list] = None,
) -> DataFrame:
    """Event-sourcing aggregate over a streaming command source.

    ``applyInPandasWithState`` keyed by ``_id``; state carries the latest
    aggregate JSON.  Emits one row per output message with a ``purpose``
    discriminator (aggregate/command/event/event-full/reply) — fan out to
    per-purpose sinks by filtering, exactly like the reference's five
    output streams (docs/state.md:97-127)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from pincette_json_streams_spark.streaming.aggregate import (
        reduce_commands,
    )

    reducer = None
    validators: dict = {}
    preprocessors: dict = {}
    if reducer_spec:
        from pincette_json_streams_spark.streaming.reducers import (
            pipeline_reducer,
        )
        reducer = pipeline_reducer(reducer_spec, script_imports)
        for cname, cspec in reducer_spec.items():
            if isinstance(cspec, dict):
                if isinstance(cspec.get("validator"), dict):
                    validators[cname] = cspec["validator"]
                if isinstance(cspec.get("preprocessor"), list):
                    preprocessors[cname] = cspec["preprocessor"]

    cols = commands.columns
    if unique_expression is not None:
        # re-key on the business key — the streaming analogue of the
        # reference's `unique` topic (docs/state.md:124,176-197)
        from pincette_json_streams_spark.operators.context import ctx_for
        from pincette_json_streams_spark.operators.expressions import (
            compile_expr,
        )
        key_col = F.to_json(F.struct(
            compile_expr(unique_expression, ctx_for(commands)).alias("__u")
        ))
    else:
        key_col = F.col("_id").cast("string")
    src = commands.select(
        key_col.alias("__key"),
        F.to_json(F.struct(*[F.col(c) for c in cols])).alias("__json"),
        (F.col(order_col) if order_col else F.lit(0)).alias("__order"),
    )

    def fold(key, pdf_iter, state):
        import pandas as pd

        cur = json.loads(state.get[0]) if state.exists else None
        out_rows = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("__order")
            cmds = [json.loads(r) for r in pdf["__json"]]
            if unique_expression is not None and cmds:
                inst = (cur or {}).get("_id") or cmds[0].get("_id")
                cmds = [{**c, "_id": inst} for c in cmds]
            recs = reduce_commands(
                cur, cmds, reducer, agg_type,
                validators=validators, preprocessors=preprocessors,
                part_preprocessor=part_preprocessor,
            )
            for r in recs:
                out_rows.append(
                    (r["purpose"], json.dumps(r["doc"]),
                     r["doc"].get("_id"))
                )
                if r["purpose"] == "aggregate":
                    cur = r["doc"]
        state.update((json.dumps(cur or {}),))
        yield pd.DataFrame(out_rows, columns=["purpose", "value", "_id"])

    return src.groupBy("__key").applyInPandasWithState(
        fold,
        outputStructType="purpose string, value string, _id string",
        stateStructType="state string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# app runner
# --------------------------------------------------------------------------

class StreamingApp:
    """Run an application's parts as streaming queries.

    ``catalog`` maps topic names to *streaming* DataFrames (kafka_source /
    file_stream_catalog).  Each ``toTopic``/``toCollection`` sink becomes
    one streaming query via ``sink_factory(name, df) -> DataStreamWriter``
    (tests use memory sinks; production uses kafka_sink/foreachBatch-Delta).
    """

    def __init__(
        self,
        spark: SparkSession,
        spec: dict,
        catalog: dict[str, DataFrame],
        pctx: Optional[PipelineContext] = None,
    ):
        from pincette_json_streams_spark.plans.planner import Application

        self.spark = spark
        self.pctx = pctx or PipelineContext(catalog=dict(catalog))
        # planner compiles identically on streaming DataFrames: stages are
        # mode-agnostic; aggregate parts are swapped for the stateful op
        spec = dict(spec)
        agg_parts = [p for p in spec.get("parts", [])
                     if p.get("type") == "aggregate"]
        spec["parts"] = [p for p in spec["parts"]
                         if p.get("type") != "aggregate"]
        self.aggregates: dict[str, DataFrame] = {}
        for part in agg_parts:
            app_name = spec.get("application", "app")
            agg_type = part.get("aggregateType", part.get("name"))
            full = f"{app_name}-{agg_type}" if "-" not in agg_type \
                else agg_type
            source = catalog[f"{full}-command"]
            folded = streaming_aggregate(
                source, full, part.get("commands"),
                order_col=part.get("orderBy"),
                script_imports=part.get("scriptImports"),
            )
            for purpose in ("aggregate", "command", "event", "event-full",
                            "reply"):
                self.aggregates[f"{full}-{purpose}"] = folded.filter(
                    F.col("purpose") == purpose
                ).select("_id", "value")
        if spec["parts"]:
            self.app = Application(spec, catalog, self.pctx)
            self.sinks = dict(self.app.run_batch())
            self.streams = dict(self.app.streams)
        else:
            self.app, self.sinks, self.streams = None, {}, {}
        self.sinks.update(self.aggregates)
        self.streams.update(self.aggregates)

    def start(
        self,
        sink_factory: Callable[[str, DataFrame], "object"],
        available_now: bool = False,
    ) -> list:
        """Start one streaming query per sink; returns the queries."""
        queries = []
        for name, df in self.sinks.items():
            writer = sink_factory(name, df)
            if available_now:
                writer = writer.trigger(availableNow=True)
            queries.append(writer.start())
        return queries

    def run_until_drained(self, sink_factory, timeout: int = 120) -> None:
        """availableNow run: process everything currently in the sources,
        then stop — the golden-test execution mode (mirrors the reference's
        `test` command draining behavior, Test.java:429-512)."""
        for q in self.start(sink_factory, available_now=True):
            q.awaitTermination(timeout)