"""TCP transport of the serve CLI (--tcp): the same line-JSON protocol over
a localhost socket — ready/partial/final flow, TWO concurrent client
connections with interleaved sessions, per-connection session ownership,
dropped-client reaping, and protocol shutdown stopping the server."""

import json
import socket
import sys
import threading
import time

import numpy as np


class _Client:
    def __init__(self, port):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=30)
        self.buf = b""

    def send(self, obj):
        self.sock.sendall((json.dumps(obj) + "\n").encode())

    def recv(self, n=1):
        """Read n response objects (blocking, 30 s socket timeout)."""
        out = []
        while len(out) < n:
            while b"\n" not in self.buf:
                data = self.sock.recv(1 << 16)
                if not data:
                    raise ConnectionError("server closed")
                self.buf += data
            line, _, self.buf = self.buf.partition(b"\n")
            out.append(json.loads(line))
        return out

    def close(self):
        self.sock.close()


def _start_server(tmp_path, monkeypatch, extra=()):
    from cli import serve

    port_file = tmp_path / "port"
    argv = ["prog", "--tcp", "0", "--port-file", str(port_file),
            "--run-dir", str(tmp_path / "run")] + list(extra)
    monkeypatch.setattr(sys, "argv", argv)
    th = threading.Thread(target=serve.main, daemon=True)
    th.start()
    for _ in range(600):  # model build + compile can take a while
        if port_file.exists() and port_file.read_text().strip():
            return th, int(port_file.read_text())
        time.sleep(0.5)
    raise TimeoutError("server never listened")


def test_tcp_two_clients_interleaved_and_ownership(tmp_path, monkeypatch):
    from mogasr.data.synthetic import make_corpus

    th, port = _start_server(tmp_path, monkeypatch)
    try:
        utts = make_corpus(2, words_per_utt=(2, 2), seed=21)
        a, b = _Client(port), _Client(port)

        a.send({"type": "start", "session": "s1"})
        assert a.recv()[0] == {"session": "s1", "event": "ready"}
        b.send({"type": "start", "session": "s2"})
        assert b.recv()[0] == {"session": "s2", "event": "ready"}

        # ownership: client b may not touch a's session (even via start)
        b.send({"type": "audio", "session": "s1", "pcm": [0.0] * 64})
        assert "owned by another connection" in b.recv()[0]["error"]
        b.send({"type": "start", "session": "s1"})
        assert "owned by another connection" in b.recv()[0]["error"]

        # interleave audio chunk by chunk across the two connections
        chunk = 4000
        ca = [utts[0].wave[i:i + chunk].astype(np.float32)
              for i in range(0, len(utts[0].wave), chunk)]
        cb = [utts[1].wave[i:i + chunk].astype(np.float32)
              for i in range(0, len(utts[1].wave), chunk)]
        pa, pb = [], []
        for i in range(max(len(ca), len(cb))):
            if i < len(ca):
                a.send({"type": "audio", "session": "s1",
                        "pcm": ca[i].tolist()})
                pa.append(a.recv()[0])
            if i < len(cb):
                b.send({"type": "audio", "session": "s2",
                        "pcm": cb[i].tolist()})
                pb.append(b.recv()[0])
        assert all(e["session"] == "s1" and "partial" in e for e in pa)
        assert all(e["session"] == "s2" and "partial" in e for e in pb)
        ts = [e["t_audio_s"] for e in pa]
        assert ts == sorted(ts)

        a.send({"type": "end", "session": "s1"})
        fin_a = a.recv()[0]
        assert fin_a["session"] == "s1" and "final" in fin_a
        b.send({"type": "end", "session": "s2"})
        fin_b = b.recv()[0]
        assert fin_b["session"] == "s2" and "final" in fin_b

        # bad json -> error on the offending connection only
        a.sock.sendall(b"{nope\n")
        assert "bad json" in a.recv()[0]["error"]

        # dropped client's session is reaped: its id becomes claimable
        b.send({"type": "start", "session": "zombie"})
        assert b.recv()[0]["event"] == "ready"
        b.close()
        time.sleep(0.5)
        a.send({"type": "start", "session": "zombie"})
        assert a.recv()[0] == {"session": "zombie", "event": "ready"}

        a.send({"type": "shutdown"})
        th.join(timeout=30)
        assert not th.is_alive()
    finally:
        if th.is_alive():  # ensure the thread dies even on test failure
            try:
                _Client(port).send({"type": "shutdown"})
            except OSError:
                pass
            th.join(timeout=10)
