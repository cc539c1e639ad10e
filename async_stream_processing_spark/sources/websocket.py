"""Live source adapters via the Python DataSource API (SURVEY §2 B13).

The reference's websocket adapter is a 9-line async generator
(``/root/reference/examples/csp/03_using_adapters/websocket/
e1_websocket_client.py:10-18``): yield ``(now(), message)`` per frame.
Spark 4's ``pyspark.sql.datasource`` lets us register the same thing as a
first-class streaming source:

* :class:`LineSocketDataSource` (``format("linesocket")``) -- stdlib TCP
  text-line source, fully testable in this container; one connection per
  micro-batch drain, offsets = running line count.
* :class:`WebSocketDataSource` (``format("websocket")``) -- same shape over
  ``websockets`` (import-gated; the package is not in this container, so
  instantiation raises a clear error until it is installed).

Both implement ``SimpleDataSourceStreamReader`` -- the cursor-based API
where Spark tracks offsets and replays between them; adequate for a
single-connection adapter (the reference is single-connection too).  A
production Kafka-style source would implement the partitioned
``DataSourceStreamReader`` instead.
"""

from __future__ import annotations

import socket
from datetime import datetime, timezone

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

SCHEMA = "ts timestamp, value string"


class _LineSocketReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.host = options.get("host", "127.0.0.1")
        self.port = int(options.get("port", "9999"))
        self.batch_lines = int(options.get("batchlines", "100"))
        self.timeout = float(options.get("timeout", "0.5"))
        self._sock = None
        self._buf = b""

    def initialOffset(self) -> dict:
        return {"n": 0}

    def _connect(self):
        if self._sock is None:
            self._sock = socket.create_connection(
                (self.host, self.port), timeout=self.timeout
            )
        return self._sock

    def read(self, start: dict):
        """Drain up to ``batch_lines`` lines; emit (event_time, line)."""
        rows = []
        try:
            sock = self._connect()
            while len(rows) < self.batch_lines:
                try:
                    chunk = sock.recv(4096)
                except TimeoutError:
                    break
                if not chunk:  # clean close ends the stream's new data
                    break
                self._buf += chunk
                while b"\n" in self._buf and len(rows) < self.batch_lines:
                    line, self._buf = self._buf.split(b"\n", 1)
                    rows.append(
                        (datetime.now(timezone.utc), line.decode("utf-8", "replace"))
                    )
        except OSError:
            pass  # source unreachable this tick -> empty batch
        end = {"n": start["n"] + len(rows)}
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        # Socket data is not replayable; deliver-at-most-once on recovery
        # (matches the reference: a reconnected websocket re-reads nothing).
        return iter([])


class LineSocketDataSource(DataSource):
    """``spark.readStream.format("linesocket").option("port", ...)``"""

    @classmethod
    def name(cls) -> str:
        return "linesocket"

    def schema(self) -> str:
        return SCHEMA

    def simpleStreamReader(self, schema):
        return _LineSocketReader(self.options)


class _WebSocketReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        try:
            from websockets.sync.client import connect  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "WebSocketDataSource requires the 'websockets' package "
                "(not installed in this container); use format('linesocket') "
                "for a stdlib-only live source"
            ) from e
        self.uri = options.get("uri", "ws://localhost:8765")
        self.batch_msgs = int(options.get("batchmsgs", "100"))
        self.timeout = float(options.get("timeout", "0.5"))
        self._conn = None

    def initialOffset(self) -> dict:
        return {"n": 0}

    def read(self, start: dict):  # pragma: no cover - needs websockets
        from websockets.sync.client import connect

        if self._conn is None:
            self._conn = connect(self.uri)
        rows = []
        while len(rows) < self.batch_msgs:
            try:
                msg = self._conn.recv(timeout=self.timeout)
            except Exception:
                break
            rows.append((datetime.now(timezone.utc), str(msg)))
        return iter(rows), {"n": start["n"] + len(rows)}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([])


class WebSocketDataSource(DataSource):
    """``spark.readStream.format("websocket").option("uri", ...)`` --
    the reference adapter (e1_websocket_client.py:10-18) as a real source."""

    @classmethod
    def name(cls) -> str:
        return "websocket"

    def schema(self) -> str:
        return SCHEMA

    def simpleStreamReader(self, schema):
        return _WebSocketReader(self.options)


def register_sources(spark) -> None:
    """Register both adapters on a session."""
    spark.dataSource.register(LineSocketDataSource)
    spark.dataSource.register(WebSocketDataSource)
