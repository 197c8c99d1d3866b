"""Latest-state-per-key on the transformWithState API (Spark 4).

Same operator contract as ``stateful.latest_state_stream`` (the
reference's "latest event wins" operational views, src/dao.ts:384-427,
kept as O(keys) streaming state instead of history-growing argmax
recompute) — but on ``transformWithStateInPandas``, the successor API
to ``applyInPandasWithState``: typed per-key state handles
(ValueState), explicit timers, schema evolution support, and the
RocksDB state store (changelog-checkpointed, so state size is bounded
by keys and checkpoint time by the delta — the property that matters
at 10^8 pools/users).

Both implementations stay in the codebase deliberately: the v1
operator runs on any state store, this one requires
``spark.sql.streaming.stateStore.providerClass`` =
RocksDBStateStoreProvider (``install_rocksdb_state_store`` sets it);
the equivalence tests pin both to the same batch argmax.

Environment note: the transformWithState Python protocol needs the
``google.protobuf`` package (pyspark's state-server messages are
protobuf-encoded). Where it is absent the equivalence test skips and
``stateful.latest_state_stream`` is the exercised operator — same
contract, older API.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def install_rocksdb_state_store(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)


class _LatestStateProcessor(StatefulProcessor):
    def __init__(self, key_col: str, event_id_col: str, value_cols: tuple[str, ...]):
        self._key_col = key_col
        self._event_id_col = event_id_col
        self._value_cols = value_cols

    def init(self, handle: StatefulProcessorHandle) -> None:
        state_schema = T.StructType(
            [
                T.StructField(self._event_id_col, T.LongType()),
                *[T.StructField(c, T.DoubleType()) for c in self._value_cols],
            ]
        )
        self._latest = handle.getValueState("latest", state_schema)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        best_id = None
        best_vals: list[float] | None = None
        if self._latest.exists():
            stored = self._latest.get()
            best_id, best_vals = int(stored[0]), [float(v) for v in stored[1:]]
        changed = False
        for pdf in rows:
            if pdf.empty:
                continue
            row = pdf.loc[pdf[self._event_id_col].idxmax()]
            rid = int(row[self._event_id_col])
            if best_id is None or rid > best_id:
                best_id = rid
                best_vals = [float(row[c]) for c in self._value_cols]
                changed = True
        if changed:
            self._latest.update((best_id, *best_vals))
            yield pd.DataFrame(
                [(key[0], best_id, *best_vals)],
                columns=[self._key_col, self._event_id_col, *self._value_cols],
            )

    def close(self) -> None:
        pass


def latest_state_stream_tws(
    stream: DataFrame,
    key_col: str,
    event_id_col: str = "event_id",
    value_cols: tuple[str, ...] = ("value",),
) -> DataFrame:
    """Streaming latest-row-per-key via transformWithStateInPandas;
    emits, per micro-batch, only the keys whose latest row changed
    (update semantics)."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField(event_id_col, T.LongType()),
            *[T.StructField(c, T.DoubleType()) for c in value_cols],
        ]
    )
    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_LatestStateProcessor(key_col, event_id_col, value_cols),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
