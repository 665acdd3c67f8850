"""Network CLI tests (reference cli/tests NetworkIO analog): in-process server +
client over a loopback socket."""

import threading

from quickstep_tpu import Database
from quickstep_tpu.cli.network import QueryClient, QueryServer


def test_network_roundtrip():
    db = Database()
    db.execute("CREATE TABLE n (a INT NOT NULL)")
    db.execute("INSERT INTO n VALUES (1), (2), (3)")
    server = QueryServer(db, port=0)   # ephemeral port
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        client = QueryClient("127.0.0.1", server.port)
        resp = client.query("SELECT sum(a) AS s FROM n")
        assert resp["rows"] == [[6]]
        assert resp["columns"] == ["s"]
        assert "6" in resp["stdout"]
        # error path
        resp = client.query("SELECT nope FROM n")
        assert "unknown column" in resp["stderr"]
        # second query on same connection
        resp = client.query("SELECT count(*) FROM n WHERE a > 1")
        assert resp["rows"] == [[2]]
        client.close()
    finally:
        server.shutdown()
