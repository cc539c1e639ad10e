"""Live TCP source through the custom Python DataSource.

Mirrors ``/root/reference/examples/csp/03_using_adapters/websocket/
e1_websocket_client.py``: an adapter yields (event_time, message) per
received frame until the server closes.  Here the adapter is a registered
streaming source (``format("linesocket")``; the websocket twin is
``format("websocket")``, gated on the websockets package), and this script
runs its own one-shot server -- fully self-contained like the reference's
server+client pair.
"""

from __future__ import annotations

import socket
import threading
import time

from common import get_example_spark


def main(spark):
    from async_stream_processing_spark.sources.websocket import register_sources

    register_sources(spark)

    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    port = server.getsockname()[1]
    server.listen(1)

    def serve():
        conn, _ = server.accept()
        for greeting in ["hello", "from", "the", "wire"]:
            conn.sendall(f"{greeting}\n".encode())
            time.sleep(0.1)
        conn.close()

    threading.Thread(target=serve, daemon=True).start()

    out = []
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        q = (
            spark.readStream.format("linesocket")
            .option("port", str(port))
            .load()
            .writeStream.foreachBatch(lambda b, _: out.extend(b.collect()))
            .option("checkpointLocation", f"{tmp}/ckpt")
            .start()
        )
        deadline = time.time() + 30
        while time.time() < deadline and len(out) < 4:
            time.sleep(0.5)
        q.stop()
    server.close()
    print("live messages:", [(str(r["ts"]), r["value"]) for r in out])
    return out


if __name__ == "__main__":
    main(get_example_spark())
