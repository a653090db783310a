"""Round-9 second-half tests: network-attached streaming sources.

The r8 VERDICT listed "no network-attached streaming source" as an
accepted sandbox limitation (no external bus).  Localhost TCP needs
no external anything: these tests stand up a real socket server in a
thread, drive Structured Streaming's socket source through the shared
event transforms, and assert exact results — the push-based network
source path (listener → micro-batch), not the file source's polling.
The rate source test covers the second built-in generator source.
"""

from __future__ import annotations

import socket
import threading
import time

import pytest
from pyspark.sql import functions as F


def _serve_lines(lines, ready, done, port_holder):
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    port_holder.append(srv.getsockname()[1])
    srv.listen(1)
    ready.set()
    conn, _ = srv.accept()
    try:
        for ln in lines:
            conn.sendall((ln + "\n").encode())
        # keep the connection open until the reader has drained —
        # closing early can race the final micro-batch
        done.wait(timeout=60)
    finally:
        conn.close()
        srv.close()


class TestSocketSource:
    def test_socket_stream_tumbling_counts_exact(self, spark):
        """20 events stream over a real TCP connection into a
        watermarked hourly tumbling count; the memory sink must hold
        exactly the per-(hour, type) counts of what the server sent."""
        from stellarsql_spark.streaming.runtime import socket_stream

        base_us = 1_700_000_000_000_000  # stable hour-aligned-ish epoch
        lines, want = [], {}
        for i in range(20):
            hour = i % 3
            etype = ("view", "click")[i % 2]
            ts_us = base_us + hour * 3_600_000_000 + (i * 7_000_000)
            lines.append(f"{i},{ts_us},{i % 5},{etype},{float(i):.1f}")
            hour_start = (ts_us // 3_600_000_000) * 3_600_000_000
            want[(hour_start, etype)] = want.get((hour_start, etype), 0) + 1

        ready, done, ports = threading.Event(), threading.Event(), []
        t = threading.Thread(
            target=_serve_lines, args=(lines, ready, done, ports), daemon=True
        )
        t.start()
        assert ready.wait(timeout=10)

        src = socket_stream(spark, "127.0.0.1", ports[0])
        agg = (
            src.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(
                F.unix_micros(F.col("w.start")).alias("h"), "event_type", "n"
            )
        )
        name = "socket_tumbling_sink"
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .start()
        )
        try:
            deadline = time.time() + 45
            got = {}
            while time.time() < deadline:
                q.processAllAvailable()
                rows = spark.sql(f"SELECT * FROM {name}").collect()
                got = {(r.h, r.event_type): r.n for r in rows}
                if got == want:
                    break
                time.sleep(0.5)
            assert got == want
        finally:
            done.set()
            q.stop()
        t.join(timeout=10)


class TestRateSource:
    def test_rate_stream_values_are_dense_prefix(self, spark):
        """The rate source generates value = 0,1,2,... — after a short
        drain the collected event_ids must be a dense prefix of the
        naturals and the projected columns must follow the documented
        round-robin arithmetic."""
        from stellarsql_spark.streaming.runtime import rate_stream

        src = rate_stream(spark, rows_per_second=500)
        name = "rate_sink"
        q = (
            src.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
        try:
            deadline = time.time() + 30
            rows = []
            while time.time() < deadline:
                q.processAllAvailable()
                rows = spark.sql(f"SELECT * FROM {name}").collect()
                if len(rows) >= 100:
                    break
                time.sleep(0.5)
            assert len(rows) >= 100
        finally:
            q.stop()
        ids = sorted(r.event_id for r in rows)
        assert ids == list(range(len(ids)))  # dense prefix, no gaps
        for r in rows:
            assert r.user_id == r.event_id % 97
            assert r.event_type == ("view", "click", "purchase")[r.event_id % 3]
            assert r.value == float(r.event_id % 1000)
