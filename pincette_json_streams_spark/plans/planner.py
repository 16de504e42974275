"""Planner: canonical application spec -> executable Spark plans.

The reference interprets the spec per message with a reactive-streams
Processor chain (App.java:758-791 — SURVEY.md §3.2).  Here each part
compiles to a DataFrame lineage over a *source catalog*; Catalyst owns the
physical plan.  The same compiled parts run:

  - batch  — catalog maps topic/collection names to static DataFrames
    (parquet/Delta); `run_batch` returns the sink outputs.  This is the
    mode the golden tests and the driver's DuckDB oracle exercise.
  - stream — catalog maps names to streaming DataFrames (Kafka/Delta CDF);
    the streaming runtime starts one query per sink
    (pincette_json_streams_spark.streaming.runtime).

Join parts: the reference buffers both sides in MongoDB collections and
re-queries within a millisecond window (App.java:685-709,881-920).  The
Spark-first equivalent is a relational equi-join on the computed keys —
bounded data joins exactly; streaming adds watermarks per the window.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pincette_json_streams_spark.operators.context import ctx_for
from pincette_json_streams_spark.operators.expressions import compile_expr
from pincette_json_streams_spark.operators.stages import (
    PipelineContext,
    compile_pipeline,
)
from pincette_json_streams_spark.plans.spec import (
    SpecError,
    validate_application,
)

__all__ = ["Application"]


class Application:
    """A compiled application over a source catalog."""

    def __init__(
        self,
        spec: dict,
        catalog: dict[str, DataFrame],
        pctx: Optional[PipelineContext] = None,
    ):
        validate_application(spec)  # Validate.java runs on every load
        self.spec = spec
        self.catalog = dict(catalog)
        self.pctx = pctx or PipelineContext(catalog=self.catalog)
        if self.pctx.app_name is None:
            self.pctx.app_name = spec.get("application")
        self.streams: dict[str, DataFrame] = {}
        self.sinks: dict[str, DataFrame] = {}
        self._compile()

    # -- sources -----------------------------------------------------------
    def _source(self, part: dict) -> DataFrame:
        if "fromTopic" in part:
            return self._topic(part["fromTopic"])
        if "fromCollection" in part:
            df = self._topic(part["fromCollection"])
            # collection sources make _id the message key as a string
            # (docs/streams.md supported-fields table)
            if "_id" in df.columns:
                df = df.withColumn("_id", F.col("_id").cast("string"))
            return df
        if "fromStream" in part:
            name = part["fromStream"]
            if name not in self.streams:
                raise SpecError(f"stream {name!r} not yet compiled")
            return self.streams[name]
        raise SpecError(f"part has no source: {part}")

    def _topic(self, name: str) -> DataFrame:
        if name not in self.catalog:
            raise SpecError(f"source {name!r} not in catalog")
        return self.catalog[name]

    # -- compilation ---------------------------------------------------------
    def _compile(self) -> None:
        parts = list(self.spec["parts"])
        pending = parts
        # parts can reference later parts by stream name: fixpoint ordering
        for _ in range(len(parts) + 1):
            still: list[dict] = []
            for part in pending:
                try:
                    self._compile_part(part)
                except SpecError:
                    still.append(part)
            if not still:
                break
            if len(still) == len(pending):
                raise SpecError(
                    f"unresolvable part references: "
                    f"{[p.get('name') for p in still]}"
                )
            pending = still

    def _compile_part(self, part: dict) -> None:
        t = part["type"]
        if t == "stream":
            out = compile_pipeline(
                self._source(part), part.get("pipeline", []), self.pctx
            )
        elif t == "merge":
            out = self._compile_merge(part)
        elif t == "join":
            out = self._compile_join(part)
        elif t == "aggregate":
            from pincette_json_streams_spark.streaming.aggregate import (
                compile_aggregate_batch,
            )
            outs = compile_aggregate_batch(part, self)
            for purpose, df in outs.items():
                self.streams[f"{purpose}"] = df
            return
        else:
            raise SpecError(f"unknown part type {t}")
        name = part["name"]
        # tracesTopic behavior (docs/telemetry.md:54): a configured
        # trace producer gets one event trace per correlated message
        # at the part output, with the reference's subpart naming
        # (`<part>.out` for streams, `<part>.merged` for merges;
        # join inputs are traced inside _compile_join as
        # `<part>.left.in`/`<part>.right.in`).  Aggregate parts emit
        # their own event stream and are not wrapped here.
        from pincette_json_streams_spark.streaming.effects import (
            emit_event_traces,
        )
        if t in ("stream", "merge"):
            suffix = ".out" if t == "stream" else ".merged"
            out = emit_event_traces(out, f"{name}{suffix}", self.pctx,
                                    part=name)
        self.streams[name] = out
        if "toTopic" in part:
            df = out
            if part.get("toString"):
                df = df.select(F.to_json(F.struct("*")).alias("value"))
            self._add_sink(part["toTopic"], df)
        if "toCollection" in part:
            self._add_sink(part["toCollection"], out)

    def _add_sink(self, name: str, df: DataFrame) -> None:
        # several parts may produce to the same topic (reference app3:
        # two streams -> one `out`); a topic is a UNION of its producers
        prev = self.sinks.get(name)
        self.sinks[name] = df if prev is None else \
            prev.unionByName(df, allowMissingColumns=True)

    def _compile_merge(self, part: dict) -> DataFrame:
        sources: list[DataFrame] = []
        for key, single in (
            ("fromTopics", "fromTopic"),
            ("fromStreams", "fromStream"),
            ("fromCollections", "fromCollection"),
        ):
            for name in part.get(key, []):
                sources.append(self._source({single: name, "type": "stream"}))
        if not sources:
            raise SpecError(
                f"merge part {part.get('name')!r} has no sources "
                "(fromTopics/fromStreams/fromCollections)"
            )
        out = sources[0]
        for s in sources[1:]:
            out = out.unionByName(s, allowMissingColumns=True)
        return out

    def _compile_join(self, part: dict) -> DataFrame:
        left_spec, right_spec = part["left"], part["right"]
        left = self._source(left_spec)
        right = self._source(right_spec)
        # reference trace subparts <part>.left.in / <part>.right.in
        # (docs/telemetry.md metrics-attribute table)
        from pincette_json_streams_spark.streaming.effects import (
            emit_event_traces,
        )
        pname = part.get("name", "join")
        left = emit_event_traces(left, f"{pname}.left.in", self.pctx,
                                 part=pname)
        right = emit_event_traces(right, f"{pname}.right.in", self.pctx,
                                  part=pname)
        lkey = compile_expr(left_spec["on"], ctx_for(left))
        rkey = compile_expr(right_spec["on"], ctx_for(right))
        window_ms = part.get("window")
        streaming = left.isStreaming or right.isStreaming
        l = left.select(
            lkey.cast("string").alias("_id"), F.struct("*").alias("left")
        )
        r = right.select(
            rkey.cast("string").alias("_id"), F.struct("*").alias("right")
        )
        # Output shape {_id, left, right} per App.java:433-447.  The
        # window (ms, default infinite) constrains *arrival-time* skew —
        # the reference stamps each side with `_join_timestamp` on arrival
        # and queries the other side within [now-window, now]
        # (App.java:367-369,418-427).  Streaming mapping: ingest-time
        # column + watermark + symmetric time-range join condition, which
        # lets Spark expire join state at exactly the window the reference
        # TTLs its Mongo buffers at.  Infinite window (no `window` field)
        # -> unbounded state, like the reference's default.  Bounded batch
        # inputs: every pair is within any window -> plain equi-join.
        if streaming and window_ms:
            delay = f"{max(int(window_ms), 1000) // 1000} seconds"
            l = l.withColumn("__l_ts", F.current_timestamp()) \
                 .withWatermark("__l_ts", delay)
            r = r.withColumn("__r_ts", F.current_timestamp()) \
                 .withWatermark("__r_ts", delay)
            cond = (
                (l["_id"] == r["_id"])
                & (l["__l_ts"] >= r["__r_ts"] - F.expr(
                    f"INTERVAL {delay}"))
                & (l["__l_ts"] <= r["__r_ts"] + F.expr(
                    f"INTERVAL {delay}"))
            )
            joined = (
                l.join(r, cond, "inner")
                .select(l["_id"].alias("_id"), "left", "right",
                        l["__l_ts"])
            )
            # the reference suppresses identical join outputs within 1 s
            # (App.java:707-708: duplicateFilter on the message value) —
            # matching pairs arriving simultaneously can double-emit.
            # Same here: value-keyed dropDuplicatesWithinWatermark rides
            # the join's existing watermark (a new one can't be defined
            # downstream of a stream-stream join), so the suppression
            # window is max(1 s, join window) and dedup state expires
            # with it — O(rate), not O(data).
            return (
                joined.withColumn(
                    "__pair_key",
                    F.sha2(F.to_json(F.struct("_id", "left", "right")), 256),
                )
                .dropDuplicatesWithinWatermark(["__pair_key"])
                .drop("__pair_key", "__l_ts")
            )
        return l.join(r, "_id", "inner")

    # -- execution -----------------------------------------------------------
    def stream(self, name: str) -> DataFrame:
        return self.streams[name]

    def run_batch(self) -> dict[str, DataFrame]:
        """-> {sink name: DataFrame} for toTopic/toCollection sinks, plus
        $out/$merge targets captured during stage compilation."""
        out = dict(self.pctx.outputs)
        out.update(self.sinks)
        return out
