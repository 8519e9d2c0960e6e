"""Bounded-state incremental top-k (``applyInPandasWithState``).

``streaming.ann.grouped_topk`` ranks with a streaming aggregation whose
state is the FULL candidate list per query (``collect_list``) — exact,
but the state grows with every candidate a query ever sees. When the
same key's candidates keep arriving across micro-batches (continuous
re-scoring, long-lived queries, per-entity leaderboards), the right
shape is a custom stateful operator whose state is the top-k ITSELF:
O(k) per key, forever.

``topk_update`` is that operator: per key, merge the incoming batch's
(score, id) pairs with the stored top-k — keyed by id, so a re-scored
candidate REPLACES its stored entry rather than occupying two slots —
keep the best k (score desc, id asc — the engine's standard ANN
tie-break), store exactly those k, and re-emit the key's current top-k
(update semantics). For distinct candidate ids the merge is associative
and arrival-order-insensitive, so ANY micro-batch split converges to
the same answer as one batch — the parity the pytest pins against
``grouped_topk``. Re-scoring contract, stated rather than hidden:
latest score wins, and a DOWNWARD re-score of a stored entry cannot
resurrect candidates already evicted from the O(k) state — if scores
can decrease and exact answers matter, keep the aggregation-based
``grouped_topk`` whose state is the full candidate list.

Built on ``applyInPandasWithState`` (the GroupState API the engine's
sessionization and funnel operators already use; Spark 4's
``transformWithStateInPandas`` is the successor API but its Python
driver worker needs protobuf, absent in this container — the operator
semantics are API-independent). Streaming frames only; the batch face
IS ``grouped_topk``, which plans the identical ranking as one
aggregation.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["topk_update"]

_OUT_SCHEMA = "q_id long, rank long, vec_id long, cosine double"
_STATE_SCHEMA = "ids array<bigint>, scores array<double>"


def topk_update(cand: DataFrame, k: int, *, round_to: int = 6) -> DataFrame:
    """Incremental per-key top-k over a streaming ``(qid, id, cosine)``
    candidate frame: ``(q_id, rank, vec_id, cosine)`` — the key's
    CURRENT top-k after each micro-batch it appears in, with state
    bounded at O(k) per key."""

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # keyed by id so a RE-SCORED candidate replaces its stored entry
        # (stored first, then batch rows in arrival order — latest wins);
        # a plain list concat would hold the same id twice, burning top-k
        # slots and pinning the stale score
        best: dict = {}
        if state.exists:
            ids, scores = state.get
            best.update(zip(ids, scores))
        for pdf in pdfs:
            best.update(zip(pdf["id"].tolist(), pdf["cosine"].tolist()))
        pairs = sorted(((s, i) for i, s in best.items()),
                       key=lambda t: (-t[0], t[1]))[:k]
        state.update((
            [int(i) for _, i in pairs],
            [float(s) for s, _ in pairs],
        ))
        yield pd.DataFrame({
            "q_id": [int(key[0])] * len(pairs),
            "rank": [r + 1 for r in range(len(pairs))],
            "vec_id": [int(i) for _, i in pairs],
            "cosine": [round(float(s), round_to) for s, _ in pairs],
        })

    return cand.groupBy("qid").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
