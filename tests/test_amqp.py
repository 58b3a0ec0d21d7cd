"""AMQP 0-9-1 wire client + landing-dir bridge, against a loopback fake
broker speaking the same protocol subset (no RabbitMQ in the sandbox —
the wire format is what these tests pin)."""

from __future__ import annotations

import socket
import struct
import threading

from cruncher_spark.streaming.amqp import (
    FRAME_BODY,
    FRAME_END,
    FRAME_HEADER,
    FRAME_METHOD,
    AmqpClient,
    Reader,
    drain_to_landing_dir,
    empty_table,
    longstr,
    shortstr,
)


class FakeBroker(threading.Thread):
    """Single-connection AMQP 0-9-1 server: handshake, channel, declare,
    qos, consume (delivers preloaded messages, then Basic.Cancel), ack
    and publish recording."""

    def __init__(
        self, messages: list[bytes], hold_open: bool = False, port: int = 0
    ):
        super().__init__(daemon=True)
        #: hold_open=True models a LIVE queue that is merely empty right
        #: now: no consumer-cancel when drained, the stream stays open
        self.hold_open = hold_open
        self.messages = list(messages)
        self.acked: list[int] = []
        self.published: list[tuple[str, bytes]] = []
        self.declared: list[str] = []
        srv = socket.socket()
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", port))
        srv.listen(1)
        self.srv, self.port = srv, srv.getsockname()[1]
        self._next_tag = 1
        self._prefetch = 10_000
        self._outstanding = 0
        self._consuming = False
        self._cancel_sent = False

    # -- framing (server side) ----------------------------------------------

    def _send(self, ftype, channel, payload):
        self.conn.sendall(
            struct.pack(">BHI", ftype, channel, len(payload))
            + payload
            + bytes([FRAME_END])
        )

    def _method(self, channel, cls, meth, args=b""):
        self._send(FRAME_METHOD, channel, struct.pack(">HH", cls, meth) + args)

    def _recv_exact(self, n):
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("client gone")
            buf += chunk
        return buf

    def _recv_frame(self):
        ftype, channel, size = struct.unpack(">BHI", self._recv_exact(7))
        payload = self._recv_exact(size)
        assert self._recv_exact(1)[0] == FRAME_END
        return ftype, channel, payload

    # -- protocol ------------------------------------------------------------

    def run(self):  # noqa: C901 - linear protocol script
        self.conn, _ = self.srv.accept()
        try:
            assert self._recv_exact(8) == b"AMQP\x00\x00\x09\x01"
            self._method(
                0, 10, 10,
                struct.pack(">BB", 0, 9) + empty_table()
                + longstr(b"PLAIN") + longstr(b"en_US"),
            )
            self._expect(10, 11)  # Start-Ok
            self._method(0, 10, 30, struct.pack(">HIH", 0, 131072, 0))  # Tune
            self._expect(10, 31)
            self._expect(10, 40)  # Connection.Open
            self._method(0, 10, 41, shortstr(""))
            self._expect(20, 10)  # Channel.Open
            self._method(1, 20, 11, longstr(b""))
            while True:
                ftype, _ch, payload = self._recv_frame()
                if ftype != FRAME_METHOD:
                    continue
                r = Reader(payload)
                cls, meth = r.u16(), r.u16()
                if (cls, meth) == (50, 10):  # Queue.Declare
                    r.u16()
                    self.declared.append(r.shortstr())
                    self._method(
                        1, 50, 11,
                        shortstr(self.declared[-1]) + struct.pack(">II", len(self.messages), 0),
                    )
                elif (cls, meth) == (60, 10):  # Basic.Qos
                    r.u32()
                    self._prefetch = r.u16() or 10_000
                    self._method(1, 60, 11)
                elif (cls, meth) == (60, 20):  # Basic.Consume
                    self._method(1, 60, 21, shortstr("ctag"))
                    self._consuming, self._cancel_sent = True, False
                    self._maybe_deliver()
                elif (cls, meth) == (60, 80):  # Basic.Ack
                    self.acked.append(r.u64())
                    self._outstanding -= 1
                    self._maybe_deliver()
                elif (cls, meth) == (60, 40):  # Basic.Publish
                    r.u16()
                    r.shortstr()  # exchange
                    rkey = r.shortstr()
                    _t, _c, hp = self._recv_frame()
                    hr = Reader(hp)
                    hr.u16(), hr.u16()
                    size = hr.u64()
                    body = b""
                    while len(body) < size:
                        _bt, _bc, bp = self._recv_frame()
                        body += bp
                    self.published.append((rkey, body))
                elif (cls, meth) == (10, 50):  # Connection.Close
                    self._method(0, 10, 51)
                    return
        except (ConnectionError, AssertionError, OSError):
            pass
        finally:
            self.conn.close()
            self.srv.close()

    def _expect(self, cls, meth):
        while True:
            ftype, _ch, payload = self._recv_frame()
            if ftype != FRAME_METHOD:
                continue
            r = Reader(payload)
            got = (r.u16(), r.u16())
            assert got == (cls, meth), f"expected {(cls, meth)}, got {got}"
            return r

    def _maybe_deliver(self):
        """Deliver while the prefetch window has room (RabbitMQ basic.qos
        semantics); when the queue empties, end the stream with a
        consumer-cancel notification exactly once."""
        if not self._consuming:
            return
        while self.messages and self._outstanding < self._prefetch:
            body = self.messages.pop(0)
            tag = self._next_tag
            self._next_tag += 1
            self._outstanding += 1
            self._method(
                1, 60, 60,
                shortstr("ctag") + struct.pack(">QB", tag, 0)
                + shortstr("") + shortstr("crunch"),
            )
            self._send(FRAME_HEADER, 1, struct.pack(">HHQH", 60, 0, len(body), 0))
            self._send(FRAME_BODY, 1, body)
        if not self.messages and not self._cancel_sent and not self.hold_open:
            self._method(1, 60, 30, shortstr("ctag") + b"\x01")
            self._cancel_sent = True
            self._consuming = False


def test_drain_bridges_queue_to_landing_dir(spark, tmp_path):
    ids = [str(n).encode() for n in range(7)]
    broker = FakeBroker(ids)
    broker.start()
    client = AmqpClient(port=broker.port).connect()
    landed = drain_to_landing_dir(
        client, "crunch", str(tmp_path / "land"), batch_size=3
    )
    client.close()
    broker.join(timeout=10)

    assert landed == 7
    assert broker.declared == ["crunch"]
    assert sorted(broker.acked) == list(range(1, 8))  # every delivery acked
    files = sorted((tmp_path / "land").glob("batch-*.txt"))
    assert len(files) == 3  # 3 + 3 + 1
    assert not list((tmp_path / "land").glob(".*tmp"))
    # the engine's file stream reads exactly the drained ids
    got = sorted(
        r.value for r in spark.read.text(str(tmp_path / "land")).collect()
    )
    assert got == sorted(i.decode() for i in ids)


def test_publish_reaches_broker(tmp_path):
    broker = FakeBroker([])
    broker.start()
    client = AmqpClient(port=broker.port).connect()
    client.publish("crunch_failed", b'{"id": "bad"}')
    client.publish("notify.global", b"crunch_update")
    client.close()
    broker.join(timeout=10)
    assert broker.published == [
        ("crunch_failed", b'{"id": "bad"}'),
        ("notify.global", b"crunch_update"),
    ]


def test_consume_flushes_partial_batch_on_timeout():
    """worker.js:29-30,147-148 EXACT count-OR-timeout batching: with only
    2 messages on a live (held-open) queue and BATCHSIZE=1000, the batch
    flushes with 2 messages after LOAD_TIMEOUT instead of blocking; an
    idle follow-up call returns an empty batch after the timeout, with
    the stream still usable."""
    import time

    broker = FakeBroker([b"a", b"b"], hold_open=True)
    broker.start()
    client = AmqpClient(port=broker.port).connect()
    client.queue_declare("crunch")

    t0 = time.monotonic()
    batch = client.consume("crunch", 1000, timeout_s=0.5)
    dt = time.monotonic() - t0
    assert [d.body for d in batch] == [b"a", b"b"]
    assert 0.4 <= dt < 5.0  # waited for the timeout, not forever

    t0 = time.monotonic()
    assert client.consume("crunch", 1000, timeout_s=0.3) == []
    assert time.monotonic() - t0 >= 0.25
    for d in batch:
        client.basic_ack(d.delivery_tag)
    client.close()
    broker.join(timeout=10)
    assert sorted(broker.acked) == [1, 2]


# --- chaos: faults around the exact count-or-timeout flush (VERDICT r5 #8)


class ChaosBroker(FakeBroker):
    """FakeBroker with injectable wire faults."""

    def __init__(
        self,
        messages,
        *,
        method_then_stall: float = 0.0,
        split_body_stall: float = 0.0,
        die_on_ack: bool = False,
        redeliver_all: bool = False,
        **kw,
    ):
        super().__init__(messages, **kw)
        self.method_then_stall = method_then_stall
        self.split_body_stall = split_body_stall
        self.die_on_ack = die_on_ack
        self.redeliver_all = redeliver_all

    def _maybe_deliver(self):
        import time

        if not self._consuming:
            return
        first = True
        while self.messages and self._outstanding < self._prefetch:
            body = self.messages.pop(0)
            tag = self._next_tag
            self._next_tag += 1
            self._outstanding += 1
            self._method(
                1, 60, 60,
                shortstr("ctag")
                + struct.pack(">QB", tag, 1 if self.redeliver_all else 0)
                + shortstr("") + shortstr("crunch"),
            )
            if first and self.method_then_stall:
                # deliver-method sent, content frames delayed past the
                # client's flush deadline
                time.sleep(self.method_then_stall)
            self._send(
                FRAME_HEADER, 1, struct.pack(">HHQH", 60, 0, len(body), 0)
            )
            if first and self.split_body_stall:
                # body frame torn in half mid-wire: send the frame header
                # + half the payload, stall, then the rest
                frame = (
                    struct.pack(">BHI", FRAME_BODY, 1, len(body))
                    + body
                    + bytes([FRAME_END])
                )
                cut = len(frame) // 2
                self.conn.sendall(frame[:cut])
                time.sleep(self.split_body_stall)
                self.conn.sendall(frame[cut:])
            else:
                self._send(FRAME_BODY, 1, body)
            first = False
        if not self.messages and not self._cancel_sent and not self.hold_open:
            self._method(1, 60, 30, shortstr("ctag") + b"\x01")
            self._cancel_sent = True
            self._consuming = False

    def run(self):
        if not self.die_on_ack:
            return super().run()
        # like FakeBroker but the connection dies the moment the first
        # ack arrives — the crash window between landing-rename and ack
        import socket as _socket

        self.conn, _ = self.srv.accept()
        try:
            assert self._recv_exact(8) == b"AMQP\x00\x00\x09\x01"
            self._method(
                0, 10, 10,
                struct.pack(">BB", 0, 9) + empty_table()
                + longstr(b"PLAIN") + longstr(b"en_US"),
            )
            self._expect(10, 11)
            self._method(0, 10, 30, struct.pack(">HIH", 0, 131072, 0))
            self._expect(10, 31)
            self._expect(10, 40)
            self._method(0, 10, 41, shortstr(""))
            self._expect(20, 10)
            self._method(1, 20, 11, longstr(b""))
            while True:
                ftype, _ch, payload = self._recv_frame()
                if ftype != FRAME_METHOD:
                    continue
                r = Reader(payload)
                cls, meth = r.u16(), r.u16()
                if (cls, meth) == (50, 10):
                    r.u16()
                    self.declared.append(r.shortstr())
                    self._method(
                        1, 50, 11,
                        shortstr(self.declared[-1])
                        + struct.pack(">II", len(self.messages), 0),
                    )
                elif (cls, meth) == (60, 10):
                    r.u32()
                    self._prefetch = r.u16() or 10_000
                    self._method(1, 60, 11)
                elif (cls, meth) == (60, 20):
                    self._method(1, 60, 21, shortstr("ctag"))
                    self._consuming, self._cancel_sent = True, False
                    self._maybe_deliver()
                elif (cls, meth) == (60, 80):
                    # ack arrives -> broker "crashes" without recording it
                    self.conn.shutdown(_socket.SHUT_RDWR)
                    return
        except (ConnectionError, AssertionError, OSError):
            pass
        finally:
            self.conn.close()
            self.srv.close()


def test_deadline_mid_message_never_tears_the_frame():
    """A message whose content frames arrive AFTER the flush deadline
    has passed (deliver-method landed just before it) must be read to
    COMPLETION and returned — never torn, never desynced: the deadline
    bounds only the wait for a frame's first byte. The next message on
    the same stream arrives intact, proving sync survived."""
    broker = ChaosBroker(
        [b"slow-one", b"after"], method_then_stall=0.4, hold_open=True
    )
    broker.start()
    client = AmqpClient(port=broker.port).connect()
    client.queue_declare("crunch")

    batch = client.consume("crunch", 1, timeout_s=0.1)
    assert [d.body for d in batch] == [b"slow-one"]
    batch2 = client.consume("crunch", 1, timeout_s=2.0)
    assert [d.body for d in batch2] == [b"after"]
    for d in batch + batch2:
        client.basic_ack(d.delivery_tag)
    client.close()


def test_broker_stall_mid_frame_resumes_or_fails_loudly():
    """A broker stalling MID-FRAME (half a body frame on the wire) must
    not lose frame sync: a stall shorter than the socket timeout resumes
    transparently; a stall longer than it is a HARD error (the client
    never silently returns a torn message)."""
    import pytest

    # short stall: message completes, stream stays usable
    broker = ChaosBroker(
        [b"torn-in-half", b"next"], split_body_stall=0.3, hold_open=True
    )
    broker.start()
    client = AmqpClient(port=broker.port).connect()
    client.queue_declare("crunch")
    batch = client.consume("crunch", 2, timeout_s=1.5)
    assert [d.body for d in batch] == [b"torn-in-half", b"next"]
    client.close()

    # hard stall: mid-frame reads run under the socket timeout -> raises
    broker2 = ChaosBroker(
        [b"never-finishes"], split_body_stall=5.0, hold_open=True
    )
    broker2.start()
    client2 = AmqpClient(port=broker2.port, timeout=0.5).connect()
    client2.queue_declare("crunch")
    with pytest.raises((ConnectionError, OSError)):
        client2.consume("crunch", 1, timeout_s=1.0)


def test_crash_before_ack_redelivery_lands_exactly_once(tmp_path):
    """The full crash-replay cycle under OPT-IN window dedup
    (``dedupe_redelivered=True``): the bridge lands a batch, the broker
    dies before processing acks, the batch is redelivered (flagged) on
    reconnect — drain again: NO second landing file (content-addressed
    rename over the original), so Spark's file source sees the batch
    once. A later LEGITIMATE repeat of the same content (redelivered
    false) does land as a fresh uniquified file."""
    land = tmp_path / "landing"
    msgs = [b"id-1", b"id-2", b"id-3"]

    b1 = ChaosBroker(list(msgs), die_on_ack=True)
    b1.start()
    c1 = AmqpClient(port=b1.port).connect()
    n1 = drain_to_landing_dir(c1, "crunch", str(land), batch_size=10,
                              timeout_s=0.5, dedupe_redelivered=True)
    assert n1 == 3
    files1 = sorted(p.name for p in land.glob("batch-*.txt"))
    assert len(files1) == 1
    b1.join(timeout=10)
    # broker died before recording any ack
    assert b1.acked == []

    # reconnect: broker redelivers the same unacked batch, flagged
    b2 = ChaosBroker(list(msgs), redeliver_all=True)
    b2.start()
    c2 = AmqpClient(port=b2.port).connect()
    n2 = drain_to_landing_dir(c2, "crunch", str(land), batch_size=10,
                              timeout_s=0.5, dedupe_redelivered=True)
    assert n2 == 3  # acked (and absorbed), not re-landed
    files2 = sorted(p.name for p in land.glob("batch-*.txt"))
    assert files2 == files1  # STILL one file -- exactly-once
    b2.join(timeout=10)
    assert sorted(b2.acked) == [1, 2, 3]  # replay fully acked

    # same content arriving as NEW publishes = new work, must land
    b3 = ChaosBroker(list(msgs))
    b3.start()
    c3 = AmqpClient(port=b3.port).connect()
    n3 = drain_to_landing_dir(c3, "crunch", str(land), batch_size=10,
                              timeout_s=0.5, dedupe_redelivered=True)
    assert n3 == 3
    files3 = sorted(p.name for p in land.glob("batch-*.txt"))
    assert len(files3) == 2 and files1[0] in files3
    # the repeat is uniquified off the same content stem
    stem = files1[0].removesuffix(".txt")
    assert any(f.startswith(stem + "-") for f in files3)


def test_default_drain_is_at_least_once(tmp_path):
    """ADVICE r6 amqp.py:357: the DEFAULT preserves the reference's
    at-least-once contract — a flagged redelivery of already-landed
    content lands AGAIN (uniquified name, downstream dedups via the
    batch-id ledger), never a silent at-most-once drop."""
    land = tmp_path / "landing"
    msgs = [b"id-1", b"id-2"]

    b1 = ChaosBroker(list(msgs), die_on_ack=True)
    b1.start()
    c1 = AmqpClient(port=b1.port).connect()
    assert drain_to_landing_dir(
        c1, "crunch", str(land), batch_size=10, timeout_s=0.5
    ) == 2
    files1 = sorted(p.name for p in land.glob("batch-*.txt"))
    assert len(files1) == 1
    b1.join(timeout=10)

    # flagged redelivery of the identical batch: default = land again
    b2 = ChaosBroker(list(msgs), redeliver_all=True)
    b2.start()
    c2 = AmqpClient(port=b2.port).connect()
    assert drain_to_landing_dir(
        c2, "crunch", str(land), batch_size=10, timeout_s=0.5
    ) == 2
    files2 = sorted(p.name for p in land.glob("batch-*.txt"))
    assert len(files2) == 2  # at-least-once: replay re-lands
    stem = files1[0].removesuffix(".txt")
    assert any(f.startswith(stem + "-") for f in files2)
    b2.join(timeout=10)
    assert sorted(b2.acked) == [1, 2]


class DieAfterConsumeBroker(FakeBroker):
    """Handshakes, answers declare/qos/consume, then drops the
    connection — a broker crash with the stream open."""

    def _maybe_deliver(self):
        raise ConnectionError("broker crash injected")


def test_bridge_pump_reconnects_after_broker_crash(tmp_path):
    """ADVICE r5 worker.py:345 + r6 self-review: the non-once bridge
    pump must survive BOTH a broker crash mid-stream AND a failed
    reconnect attempt (the port is dark until the replacement broker
    binds), reconnecting with backoff until it succeeds and then
    draining normally. Health state records the recovery."""
    import time

    from cruncher_spark.worker import _start_amqp_bridge

    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    b1 = DieAfterConsumeBroker([], port=port)
    b1.start()
    land = tmp_path / "landing"
    health = _start_amqp_bridge(
        f"amqp://127.0.0.1:{port}", "crunch", str(land),
        batch_size=10, once=False, timeout_s=0.2,
    )
    b1.join(timeout=10)  # crashed broker gone; port dark for a while

    # first reconnect attempt(s) hit a dead port -- the inner loop must
    # absorb that too; then the replacement broker appears
    time.sleep(1.2)
    b2 = FakeBroker([b"r-1", b"r-2"], port=port)
    b2.start()

    deadline = time.monotonic() + 30
    while time.monotonic() < deadline:
        files = list(land.glob("batch-*.txt")) if land.exists() else []
        if files:
            break
        time.sleep(0.3)
    assert files, f"bridge never recovered (health={health})"
    assert files[0].read_bytes() == b"r-1\nr-2\n"
    assert health["reconnects"] >= 1
    assert health["last_error"] is not None  # the crash was recorded
