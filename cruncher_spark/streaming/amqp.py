"""Minimal AMQP 0-9-1 client + landing-dir bridge — the true RabbitMQ
source path (pure stdlib; no external broker library).

The reference worker IS an AMQP consumer (`/root/reference/worker.js:59-70`
connects, asserts `crunch` and `crunch_failed`, prefetches BATCHSIZE, and
acks after commit, worker.js:126-182). Spark has no AMQP structured-
streaming source, so the production recipe is a *bridge*: drain the queue
into a replayable log the engine already consumes — one text file of ids
per drained batch into the `start_file_stream` landing dir (or publish
into Kafka for `start_kafka_stream`). This module implements that bridge
end-to-end over a from-scratch AMQP 0-9-1 wire client: protocol
handshake, PLAIN auth, channel open, queue declare, prefetch (basic.qos),
consume/deliver with content framing, ack, and publish (for the
`_failed` DLQ and notification parity, worker.js:167-190).

Delivery guarantees compose exactly like the reference's: the bridge acks
a message only AFTER its batch file is atomically renamed into the
landing dir (ack-after-durable, at-least-once); a crash between rename
and ack redelivers, and the engine's batch-id ledger
(merge/upsert.py) makes the replay idempotent — the exactly-once upgrade
the reference lacks.

Protocol subset per the public AMQP 0-9-1 specification (frame = type(1)
channel(2) size(4) payload end(0xCE); method payload = class(2) method(2)
args; shortstr/longstr/field-table encodings). Tested against a loopback
fake broker speaking the same subset (tests/test_amqp.py) — the sandbox
has no RabbitMQ, so the wire format itself is what the tests pin.
"""

from __future__ import annotations

import os
import socket
import struct
import uuid
from dataclasses import dataclass
from pathlib import Path

FRAME_METHOD, FRAME_HEADER, FRAME_BODY, FRAME_HEARTBEAT = 1, 2, 3, 8
FRAME_END = 0xCE


# -- wire encoding helpers ---------------------------------------------------


def shortstr(s: str) -> bytes:
    b = s.encode()
    if len(b) > 255:
        raise ValueError("shortstr too long")
    return bytes([len(b)]) + b


def longstr(b: bytes) -> bytes:
    return struct.pack(">I", len(b)) + b


def empty_table() -> bytes:
    return struct.pack(">I", 0)


class Reader:
    """Cursor over one frame payload."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def u8(self) -> int:
        (v,) = struct.unpack_from(">B", self.data, self.pos)
        self.pos += 1
        return v

    def u16(self) -> int:
        (v,) = struct.unpack_from(">H", self.data, self.pos)
        self.pos += 2
        return v

    def u32(self) -> int:
        (v,) = struct.unpack_from(">I", self.data, self.pos)
        self.pos += 4
        return v

    def u64(self) -> int:
        (v,) = struct.unpack_from(">Q", self.data, self.pos)
        self.pos += 8
        return v

    def shortstr(self) -> str:
        n = self.u8()
        v = self.data[self.pos : self.pos + n]
        self.pos += n
        return v.decode()

    def longstr(self) -> bytes:
        n = self.u32()
        v = self.data[self.pos : self.pos + n]
        self.pos += n
        return v

    def skip_table(self) -> None:
        n = self.u32()
        self.pos += n


@dataclass
class Delivery:
    delivery_tag: int
    routing_key: str
    body: bytes
    redelivered: bool


class AmqpClient:
    """Blocking AMQP 0-9-1 client: one connection, one channel.

    Covers exactly the verbs the reference worker uses: declare (durable),
    qos (prefetch), consume, ack, publish. Not general-purpose — no
    multi-channel, no transactions, no heartbeat emission (heartbeat
    frames from the peer are tolerated and skipped).
    """

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 5672,
        username: str = "guest",
        password: str = "guest",
        vhost: str = "/",
        timeout: float = 30.0,
    ):
        self.host, self.port = host, port
        self.username, self.password, self.vhost = username, password, vhost
        self.timeout = timeout
        self.sock: socket.socket | None = None
        self._consuming = False

    # -- framing -------------------------------------------------------------

    def _send_frame(self, ftype: int, channel: int, payload: bytes) -> None:
        assert self.sock is not None
        self.sock.sendall(
            struct.pack(">BHI", ftype, channel, len(payload))
            + payload
            + bytes([FRAME_END])
        )

    def _send_method(self, channel: int, cls: int, meth: int, args: bytes) -> None:
        self._send_frame(FRAME_METHOD, channel, struct.pack(">HH", cls, meth) + args)

    def _recv_exact(self, n: int) -> bytes:
        assert self.sock is not None
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("AMQP peer closed the connection")
            buf += chunk
        return buf

    def _recv_frame(
        self, wait_timeout: float | None = None
    ) -> tuple[int, int, bytes] | None:
        """Read one frame. ``wait_timeout`` bounds ONLY the wait for the
        frame's first byte (returns None on expiry, stream still in
        sync); once a frame has started it is read to completion under
        the normal socket timeout — a mid-frame timeout would lose frame
        sync, so it stays a hard ConnectionError."""
        if wait_timeout is not None:
            assert self.sock is not None
            self.sock.settimeout(max(wait_timeout, 1e-3))
            try:
                first = self.sock.recv(1)
            except (TimeoutError, socket.timeout):
                return None
            finally:
                self.sock.settimeout(self.timeout)
            if not first:
                raise ConnectionError("AMQP peer closed the connection")
            header = first + self._recv_exact(6)
        else:
            header = self._recv_exact(7)
        ftype, channel, size = struct.unpack(">BHI", header)
        payload = self._recv_exact(size)
        if self._recv_exact(1)[0] != FRAME_END:
            raise ConnectionError("bad AMQP frame end")
        return ftype, channel, payload

    def _recv_method(self, want_cls: int, want_meth: int) -> Reader:
        """Next method frame, which must be the expected one (heartbeats
        skipped)."""
        while True:
            ftype, _ch, payload = self._recv_frame()
            if ftype == FRAME_HEARTBEAT:
                continue
            if ftype != FRAME_METHOD:
                raise ConnectionError(f"expected method frame, got type {ftype}")
            r = Reader(payload)
            cls, meth = r.u16(), r.u16()
            if (cls, meth) != (want_cls, want_meth):
                raise ConnectionError(
                    f"expected method ({want_cls},{want_meth}), got ({cls},{meth})"
                )
            return r

    # -- connection lifecycle -------------------------------------------------

    def connect(self) -> AmqpClient:
        self.sock = socket.create_connection((self.host, self.port), self.timeout)
        self.sock.sendall(b"AMQP\x00\x00\x09\x01")
        self._recv_method(10, 10)  # Connection.Start (contents ignored)
        sasl = b"\x00" + self.username.encode() + b"\x00" + self.password.encode()
        self._send_method(
            0, 10, 11,
            empty_table() + shortstr("PLAIN") + longstr(sasl) + shortstr("en_US"),
        )
        tune = self._recv_method(10, 30)  # Connection.Tune
        channel_max, frame_max, _heartbeat = tune.u16(), tune.u32(), tune.u16()
        self._send_method(
            0, 10, 31, struct.pack(">HIH", channel_max, frame_max, 0)
        )
        self._send_method(0, 10, 40, shortstr(self.vhost) + shortstr("") + b"\x00")
        self._recv_method(10, 41)  # Connection.Open-Ok
        self._send_method(1, 20, 10, shortstr(""))  # Channel.Open
        self._recv_method(20, 11)
        return self

    def close(self) -> None:
        if self.sock is not None:
            try:
                # Connection.Close: reply-code, reply-text, offending class/method
                self._send_method(
                    0, 10, 50, struct.pack(">H", 200) + shortstr("bye") + struct.pack(">HH", 0, 0)
                )
                self._recv_method(10, 51)  # Close-Ok
            except Exception:
                pass
            self.sock.close()
            self.sock = None

    # -- the verbs the worker uses -------------------------------------------

    def queue_declare(self, queue: str, durable: bool = True) -> None:
        """worker.js:71-72 ``assertQueue(QUEUE, {durable: true})``."""
        bits = 0x02 if durable else 0x00  # passive|durable|excl|auto-del|no-wait
        self._send_method(
            1, 50, 10,
            struct.pack(">H", 0) + shortstr(queue) + bytes([bits]) + empty_table(),
        )
        self._recv_method(50, 11)

    def basic_qos(self, prefetch_count: int) -> None:
        """worker.js:126-127 ``ch.prefetch(BATCHSIZE)`` backpressure."""
        self._send_method(1, 60, 10, struct.pack(">IHB", 0, prefetch_count, 0))
        self._recv_method(60, 11)

    def basic_ack(self, delivery_tag: int) -> None:
        self._send_method(1, 60, 80, struct.pack(">QB", delivery_tag, 0))

    def publish(self, routing_key: str, body: bytes, exchange: str = "") -> None:
        """worker.js:167-169 republish-to-DLQ / 184-190 notify publish."""
        self._send_method(
            1, 60, 40,
            struct.pack(">H", 0) + shortstr(exchange) + shortstr(routing_key) + b"\x00",
        )
        self._send_frame(
            FRAME_HEADER, 1, struct.pack(">HHQH", 60, 0, len(body), 0)
        )
        self._send_frame(FRAME_BODY, 1, body)

    def consume(
        self,
        queue: str,
        max_messages: int,
        timeout_s: float | None = None,
    ) -> list[Delivery]:
        """Pull up to ``max_messages`` deliveries (one batch), WITHOUT
        acking — the caller acks after its durable commit, preserving the
        reference's ack-after-crunch ordering (worker.js:167-182).

        ``timeout_s`` makes this the reference's EXACT count-OR-timeout
        batching (worker.js:29-30,147-148: flush at BATCHSIZE ids or
        LOAD_TIMEOUT seconds, whichever first): the batch returns as
        soon as it is full OR the deadline passes, whichever comes
        first, with a partial (possibly empty) batch on timeout. Without
        it the call blocks until the batch fills or the stream ends.

        The consumer registers ONCE; later calls keep reading the same
        delivery stream (deliveries released by prefetch as earlier
        batches ack). A server-initiated ``Basic.Cancel`` (consumer
        cancel notification) ends the stream — the batch returns short.
        """
        import time as _time

        deadline = None if timeout_s is None else _time.monotonic() + timeout_s
        if not self._consuming:
            self._send_method(
                1, 60, 20,
                struct.pack(">H", 0) + shortstr(queue) + shortstr("")
                + b"\x00" + empty_table(),
            )
            self._recv_method(60, 21)  # Consume-Ok
            self._consuming = True
        out: list[Delivery] = []
        while len(out) < max_messages:
            wait = None
            if deadline is not None:
                wait = deadline - _time.monotonic()
                if wait <= 0:
                    break
            frame = self._recv_frame(wait_timeout=wait)
            if frame is None:  # LOAD_TIMEOUT fired: flush the partial batch
                break
            ftype, _ch, payload = frame
            if ftype == FRAME_HEARTBEAT:
                continue
            if ftype != FRAME_METHOD:
                raise ConnectionError("expected Basic.Deliver")
            r = Reader(payload)
            cls, meth = r.u16(), r.u16()
            if (cls, meth) == (60, 30):  # Basic.Cancel: stream ended
                self._consuming = False
                break
            if (cls, meth) != (60, 60):
                raise ConnectionError(f"unexpected method ({cls},{meth})")
            r.shortstr()  # consumer-tag
            tag = r.u64()
            redelivered = bool(r.u8())
            r.shortstr()  # exchange
            rkey = r.shortstr()
            htype, _hch, hpayload = self._recv_frame()
            if htype != FRAME_HEADER:
                raise ConnectionError("expected content header")
            hr = Reader(hpayload)
            hr.u16(), hr.u16()  # class, weight
            body_size = hr.u64()
            body = b""
            while len(body) < body_size:
                btype, _bch, bpayload = self._recv_frame()
                if btype != FRAME_BODY:
                    raise ConnectionError("expected content body")
                body += bpayload
            out.append(Delivery(tag, rkey, body, redelivered))
        return out


# -- the bridge ---------------------------------------------------------------


def drain_to_landing_dir(
    client: AmqpClient,
    queue: str,
    landing_dir: str,
    *,
    batch_size: int = 1000,
    max_batches: int | None = None,
    timeout_s: float | None = None,
    dedupe_redelivered: bool = False,
) -> int:
    """Drain ``queue`` into the file-stream landing dir: one text file of
    message bodies (one id per line) per batch of up to ``batch_size`` —
    the BATCHSIZE grouping of worker.js:121-125 made durable.
    ``timeout_s`` per batch gives the reference's exact count-OR-timeout
    flush (BATCHSIZE ids or LOAD_TIMEOUT seconds, whichever first).

    Ack ordering: the batch file is written to a temp name and atomically
    renamed into the landing dir BEFORE any of its messages are acked
    (ack-after-durable). A crash between rename and ack redelivers the
    batch.

    Redelivery dedup (r6, OPT-IN since r7): batches land under their
    CONTENT hash (``batch-<sha256[:24]>.txt``), and with
    ``dedupe_redelivered=True`` the landing dir itself is the durable
    occurrence ledger:

    - a batch whose messages are ALL broker-flagged ``redelivered`` and
      whose content file already exists is the crash-between-rename-
      and-ack replay — nothing is written (the original landing stands,
      Spark's file source never sees a second file) and the messages are
      just acked: the common crash window stays exactly-once;
    - a batch with redelivered=false whose content file exists is a
      legitimately REPEATED batch (the same id re-crunched later —
      normal reference traffic, worker.js re-crunches a participant on
      every new match): it lands under a uniquified name and is
      processed again, as it must be;
    - a redelivery that regroups messages across batch boundaries
      (reconnect with a different prefetch cut), or whose original file
      was already pruned from the landing dir, lands as a novel file and
      degrades to at-least-once — exactly the reference's semantics
      (worker.js ACKs after commit and double-crunches on replay).

    Residual corner (r6 review; the reason the flag DEFAULTS OFF since
    r7): content alone cannot distinguish WHICH occurrence a replay
    belongs to. If a batch's content is legitimately re-published LATER,
    the drainer crashes between consume and rename of that second
    occurrence (nothing landed for it), and the broker redelivers it
    flagged — the skip branch misattributes it to the FIRST occurrence's
    landing and drops it (at-most-once for that one batch). It takes
    three coincidences (byte-identical full-batch content, a crash
    inside the sub-millisecond consume→rename window, flagged
    redelivery of the whole batch), but a silent drop is worse than the
    reference's at-least-once double-count — so the DEFAULT preserves
    the reference's at-least-once contract (worker.js ACKs after commit
    and double-crunches on replay; downstream the batch-id ledger or the
    crunch views' idempotent recompute absorb the duplicate). Deployments
    whose downstream is NOT replay-tolerant opt in to the exactly-once
    window dedup with ``dedupe_redelivered=True``, accepting the corner.

    Returns the number of messages landed (acked replays included).
    """
    import hashlib

    land = Path(landing_dir)
    land.mkdir(parents=True, exist_ok=True)
    client.queue_declare(queue)
    client.basic_qos(batch_size)
    landed = 0
    batches = 0
    while max_batches is None or batches < max_batches:
        deliveries = client.consume(queue, batch_size, timeout_s=timeout_s)
        if not deliveries:
            break
        content = b"".join(d.body + b"\n" for d in deliveries)
        base = f"batch-{hashlib.sha256(content).hexdigest()[:24]}"
        exists = (land / f"{base}.txt").exists()
        if (
            dedupe_redelivered
            and exists
            and all(d.redelivered for d in deliveries)
        ):
            name = None  # crash replay of an already-landed batch
        elif exists:
            name = f"{base}-{uuid.uuid4().hex[:8]}.txt"  # legit repeat
        else:
            name = f"{base}.txt"
        if name is not None:
            tmp = land / f".{name}.tmp.{uuid.uuid4().hex[:8]}"
            tmp.write_bytes(content)
            os.replace(tmp, land / name)  # durable before any ack
        for d in deliveries:
            client.basic_ack(d.delivery_tag)
        landed += len(deliveries)
        batches += 1
        if len(deliveries) < batch_size:
            break
    return landed
