"""Reader/writer isolation under concurrency: readers must only ever see
fully-committed versions (the pointer only advances to finalized
manifests), and every append lands exactly once even while reads hammer
the table."""

from __future__ import annotations

import threading

from lakehouse_spark.mutation.store import TableStore


def test_readers_never_see_partial_commits(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "hot"), key="id")
    store.init(spark.createDataFrame([(0, 0)], "id long, batch long"))

    BATCH_ROWS = 5
    N_APPENDS = 8
    errors: list[str] = []
    seen_counts: set[int] = set()
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                n = store.read().count()
            except Exception as ex:  # noqa: BLE001
                errors.append(f"read failed: {ex}")
                return
            # every observable state is 1 + k*BATCH_ROWS for a COMPLETE k
            if (n - 1) % BATCH_ROWS != 0:
                errors.append(f"partial commit visible: {n} rows")
                return
            seen_counts.add(n)

    t = threading.Thread(target=reader)
    t.start()
    try:
        for b in range(1, N_APPENDS + 1):
            rows = [(b * 100 + i, b) for i in range(BATCH_ROWS)]
            store.append(spark.createDataFrame(rows, "id long, batch long"))
    finally:
        stop.set()
        t.join(timeout=60)

    assert not errors, errors
    final = store.read().count()
    assert final == 1 + N_APPENDS * BATCH_ROWS
    # the reader actually observed intermediate states, not just the end
    assert len(seen_counts) >= 2
    # ids are unique — nothing double-committed
    assert store.read().select("id").distinct().count() == final
