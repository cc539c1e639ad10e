"""LIVE feedback round-trip — the real-time form of SURVEY §2 B8.

Mirrors ``/root/reference/examples/csp/02_intermediate/e1_feedback.py:27-66``
executed against the clock, not closed-form: an algo sends order 1
unprompted, the exchange ACKs each order after a delay, and every exec
report makes the algo send the NEXT order — a genuine cyclic dataflow
closed over the network.

Spark-first shape (a streaming DAG cannot contain a cycle, so the loop
closes OUTSIDE the plan — exactly how production trading stacks do it):

* exec reports arrive as a LIVE SOURCE (``format("linesocket")`` — the
  same custom Python DataSource as e10);
* the algo's reaction runs in ``foreachBatch``: parse the ACK, derive
  the next order (id+1, price+1 cent), write it BACK to the exchange's
  order socket — the feedback edge;
* the exchange (a plain TCP pair standing in for the venue) turns each
  order into an ACK on the exec-report feed after ``ack_delay``.

The batch twin (``operators/feedback.feedback_orders``, oracle-gated)
computes this timeline closed-form; this example demonstrates the live
loop actually spinning: 10 orders, 10 ACKs, ids strictly monotone.
"""

from __future__ import annotations

import socket
import tempfile
import threading
import time

N_ORDERS = 10
ACK_DELAY_S = 0.2


class _Exchange:
    """Two-socket venue: pushes exec reports on the FEED port (where
    the Spark source connects) and accepts orders on the ORDER port
    (where foreachBatch connects).  Each order line ``ORDER <id>
    <price_cents>`` becomes ``ACK <id> <price_cents>`` on the feed
    after ``ack_delay`` — the reference's Exchange.on_new_order with
    its call_later(0.7, exec_callback) compressed for CI."""

    def __init__(self, ack_delay: float = ACK_DELAY_S):
        self.ack_delay = ack_delay
        self.received_orders: list[tuple[int, int]] = []
        self._feed_conn = None
        self._lock = threading.Lock()
        self.feed_srv = self._listen()
        self.order_srv = self._listen()
        self.feed_port = self.feed_srv.getsockname()[1]
        self.order_port = self.order_srv.getsockname()[1]
        threading.Thread(target=self._accept_feed, daemon=True).start()
        threading.Thread(target=self._serve_orders, daemon=True).start()

    @staticmethod
    def _listen():
        s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind(("127.0.0.1", 0))
        s.listen(4)
        return s

    def _accept_feed(self):
        conn, _ = self.feed_srv.accept()
        with self._lock:
            self._feed_conn = conn

    def _push_ack(self, order_id: int, price_c: int):
        time.sleep(self.ack_delay)
        deadline = time.time() + 30
        while time.time() < deadline:
            with self._lock:
                conn = self._feed_conn
            if conn is not None:
                try:
                    conn.sendall(f"ACK {order_id} {price_c}\n".encode())
                except OSError:
                    pass
                return
            time.sleep(0.05)

    def _serve_orders(self):
        while True:
            try:
                conn, _ = self.order_srv.accept()
            except OSError:
                return  # closed
            buf = b""
            while True:
                try:
                    chunk = conn.recv(4096)
                except OSError:
                    break
                if not chunk:
                    break
                buf += chunk
                while b"\n" in buf:
                    line, buf = buf.split(b"\n", 1)
                    parts = line.decode().split()
                    if len(parts) == 3 and parts[0] == "ORDER":
                        oid, pc = int(parts[1]), int(parts[2])
                        self.received_orders.append((oid, pc))
                        threading.Thread(
                            target=self._push_ack, args=(oid, pc),
                            daemon=True,
                        ).start()
            conn.close()

    def close(self):
        for s in (self.feed_srv, self.order_srv):
            try:
                s.close()
            except OSError:
                pass
        with self._lock:
            if self._feed_conn is not None:
                self._feed_conn.close()


def _send_order(port: int, order_id: int, price_c: int):
    with socket.create_connection(("127.0.0.1", port), timeout=5) as c:
        c.sendall(f"ORDER {order_id} {price_c}\n".encode())


def main(spark):
    from async_stream_processing_spark.sources.websocket import (
        register_sources,
    )

    register_sources(spark)
    exchange = _Exchange()
    acks: list[tuple[int, int]] = []

    def algo_batch(batch, _bid):
        # the algo's on_exec_report: each ACK triggers the NEXT order
        # (id+1, +1 cent) until N_ORDERS have gone out — the feedback
        # edge, written back over the network
        for r in batch.collect():
            parts = r["value"].split()
            if len(parts) != 3 or parts[0] != "ACK":
                continue
            oid, pc = int(parts[1]), int(parts[2])
            acks.append((oid, pc))
            if oid < N_ORDERS:
                _send_order(exchange.order_port, oid + 1, pc + 1)

    with tempfile.TemporaryDirectory() as tmp:
        q = (
            spark.readStream.format("linesocket")
            .option("port", str(exchange.feed_port))
            .option("timeout", "0.3")
            .load()
            .writeStream.foreachBatch(algo_batch)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .start()
        )
        t0 = time.time()
        _send_order(exchange.order_port, 1, 10000)  # unprompted order 1
        deadline = time.time() + 120
        while time.time() < deadline and len(acks) < N_ORDERS:
            time.sleep(0.2)
        wall = time.time() - t0
        q.stop()
    exchange.close()

    assert len(acks) >= N_ORDERS, acks
    got = acks[:N_ORDERS]
    assert [a[0] for a in got] == list(range(1, N_ORDERS + 1)), got
    assert [a[1] for a in got] == [10000 + i for i in range(N_ORDERS)], got
    sent = exchange.received_orders[:N_ORDERS]
    assert [o[0] for o in sent] == list(range(1, N_ORDERS + 1)), sent
    # the loop really waited on the network each round: >= 10 ack delays
    assert wall >= N_ORDERS * ACK_DELAY_S
    print(f"10 round trips ACKed in {wall:.1f}s "
          f"(~{wall / N_ORDERS:.2f}s/round)")
    return got


if __name__ == "__main__":
    from common import get_example_spark

    main(get_example_spark())
