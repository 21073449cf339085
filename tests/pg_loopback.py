"""In-process socket loopback for the Postgres COPY sink tests.

The sandbox has no Postgres, but the COPY fast path
(`train_reports_etl_spark/sinks/jdbc_copy.py`, mirroring reference
`reports_exporter_v0.83.py:1357-1372` and the constraint lifecycle at
`:1801-1835`) deserves more than fake-connection unit pins: this module
provides a tiny TCP server so `copy_into_postgres` /
`bulk_load_with_constraint_hooks` run through REAL `foreachPartition`
executor calls with real bytes on a real socket.

Protocol (not pg-wire — deliberately minimal): length-framed JSON
messages ``{"op": "exec"|"copy"|"commit", ...}``. ``copy`` payloads are
staged per-connection and applied atomically on ``commit`` — matching
psycopg2 transaction semantics, so a partition that dies mid-stream
leaves nothing behind. The server parses the COPY CSV with genuine
``FORMAT csv, NULL ''`` semantics: an *unquoted* empty field is NULL, a
*quoted* ``""`` is an empty string — the exact distinction
``encode_csv_rows`` encodes.

``make_loopback_connect(port)`` returns a psycopg2-shaped ``connect``
whose client classes are defined INSIDE the closure, so cloudpickle
ships them by value to Spark's Python workers (no test-module import
needed executor-side).
"""

from __future__ import annotations

import json
import socket
import struct
import threading


def parse_copy_csv(text: str) -> list[list[str | None]]:
    """Parse COPY ``FORMAT csv, NULL ''`` payload preserving the
    quoted/unquoted distinction: unquoted empty → None (NULL), quoted
    fields unescape doubled quotes and may contain commas/newlines."""
    rows: list[list[str | None]] = []
    row: list[str | None] = []
    i, n = 0, len(text)
    pending = False  # a comma was consumed, so one more field is owed
    while i < n:
        chars: list[str] = []
        quoted = text[i] == '"'
        if quoted:
            i += 1
            while i < n:
                c = text[i]
                if c == '"':
                    if i + 1 < n and text[i + 1] == '"':
                        chars.append('"')
                        i += 2
                    else:
                        i += 1
                        break
                else:
                    chars.append(c)
                    i += 1
        else:
            while i < n and text[i] not in (",", "\r", "\n"):
                chars.append(text[i])
                i += 1
        row.append("".join(chars) if (quoted or chars) else None)
        if i < n and text[i] == ",":
            i += 1
            pending = True
            continue
        pending = False
        if i < n and text[i] == "\r":
            i += 1
        if i < n and text[i] == "\n":
            i += 1
        rows.append(row)
        row = []
    if pending:
        # payload ended right after a comma: the owed trailing field is
        # an unquoted empty → NULL ('a,' parses as ['a', None])
        row.append(None)
    if row:
        rows.append(row)
    return rows


def _recv_frame(conn: socket.socket) -> bytes | None:
    header = b""
    while len(header) < 4:
        chunk = conn.recv(4 - len(header))
        if not chunk:
            return None
        header += chunk
    (length,) = struct.unpack(">I", header)
    body = b""
    while len(body) < length:
        chunk = conn.recv(min(65536, length - len(body)))
        if not chunk:
            return None
        body += chunk
    return body


def _send_frame(conn: socket.socket, payload: bytes) -> None:
    conn.sendall(struct.pack(">I", len(payload)) + payload)


class FakePgServer:
    """Threaded loopback server recording a globally-ordered event log
    (``("exec", sql)`` and ``("copy_commit", table, n_rows)``) and the
    committed rows per table."""

    def __init__(self) -> None:
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind(("127.0.0.1", 0))
        self._sock.listen(64)
        self.port: int = self._sock.getsockname()[1]
        self.lock = threading.Lock()
        self.events: list[tuple] = []
        self.tables: dict[str, list[tuple]] = {}
        self._stop = False
        self._accept_thread = threading.Thread(target=self._accept, daemon=True)

    def __enter__(self) -> "FakePgServer":
        self._accept_thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop = True
        try:
            self._sock.close()
        except OSError:
            pass

    def _accept(self) -> None:
        while not self._stop:
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    def _serve(self, conn: socket.socket) -> None:
        staged: list[tuple[str, str]] = []
        try:
            while True:
                frame = _recv_frame(conn)
                if frame is None:
                    return  # closed without commit: staged COPYs discarded
                msg = json.loads(frame.decode("utf-8"))
                op = msg["op"]
                if op == "exec":
                    with self.lock:
                        self.events.append(("exec", msg["sql"]))
                elif op == "copy":
                    staged.append((msg["sql"], msg["data"]))
                elif op == "commit":
                    with self.lock:
                        for sql, data in staged:
                            table = sql.split("COPY ", 1)[1].split(" (", 1)[0]
                            rows = parse_copy_csv(data)
                            self.tables.setdefault(table, []).extend(
                                tuple(r) for r in rows
                            )
                            self.events.append(("copy_commit", table, len(rows)))
                    staged = []
                else:  # pragma: no cover — unknown op is a test bug
                    raise ValueError(f"unknown op {op!r}")
                _send_frame(conn, b'{"status": "ok"}')
        finally:
            conn.close()


def make_loopback_connect(port: int):
    """psycopg2-shaped ``connect(dsn)`` for the loopback server.

    Everything the executor needs is defined inside this closure so
    cloudpickle serializes it by value — Spark Python workers never
    import the tests package.
    """

    def connect(dsn: str):  # noqa: ARG001 — dsn shape is the caller's concern
        import json as _json
        import socket as _socket
        import struct as _struct

        sock = _socket.create_connection(("127.0.0.1", port), timeout=30)

        def rpc(msg: dict) -> None:
            payload = _json.dumps(msg).encode("utf-8")
            sock.sendall(_struct.pack(">I", len(payload)) + payload)
            header = b""
            while len(header) < 4:
                chunk = sock.recv(4 - len(header))
                if not chunk:
                    raise ConnectionError("server closed mid-response")
                header += chunk
            (length,) = _struct.unpack(">I", header)
            body = b""
            while len(body) < length:
                chunk = sock.recv(min(65536, length - len(body)))
                if not chunk:
                    raise ConnectionError("server closed mid-response")
                body += chunk
            if _json.loads(body.decode("utf-8")).get("status") != "ok":
                raise RuntimeError("loopback server rejected message")

        class Cursor:
            def __enter__(self):
                return self

            def __exit__(self, *exc):
                return False

            def execute(self, sql: str) -> None:
                rpc({"op": "exec", "sql": sql})

            def copy_expert(self, sql: str, fileobj) -> None:
                rpc({"op": "copy", "sql": sql, "data": fileobj.read()})

        class Conn:
            def cursor(self):
                return Cursor()

            def commit(self) -> None:
                rpc({"op": "commit"})

            def close(self) -> None:
                sock.close()

        return Conn()

    return connect
