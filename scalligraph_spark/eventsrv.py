"""In-process pub/sub — the EventSrv analog.

Reference: ``EventSrv`` publishes/subscribes through Akka DistributedPubSub
(core/.../services/EventSrv.scala:14-31) so cluster nodes learn about
writes.  A batch engine's unit of change is the COMMIT — a table-version
flip — so the analog is a thin driver-side hub: topics map to subscriber
callables, ``publish`` delivers synchronously, ``publish_ask`` returns the
subscribers' replies (the ``publishAsk`` ask-pattern).  The
:class:`~scalligraph_spark.store.LabelStore` wires it at write time: every
commit publishes ``{"label", "version", "meta"}`` on ``store:<label>`` —
SURVEY §2.9's "thin notification hook at write time".
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Callable


class EventSrv:
    def __init__(self):
        self._subs: dict[str, list[Callable]] = defaultdict(list)

    def subscribe(self, topic: str, fn: Callable[[Any], Any]) -> Callable[[Any], Any]:
        """Register a callback; returns it as the unsubscribe handle
        (EventSrv.scala:29 ``Subscribe``)."""
        self._subs[topic].append(fn)
        return fn

    def unsubscribe(self, topic: str, fn: Callable[[Any], Any]) -> None:
        try:
            self._subs[topic].remove(fn)
        except ValueError:
            pass

    def publish(self, topic: str, message: Any) -> None:
        """Fire-and-forget delivery to every subscriber (EventSrv.scala:18-21).
        Subscriber errors propagate — a commit hook that fails should fail
        loudly, not vanish in a log."""
        for fn in list(self._subs.get(topic, ())):
            fn(message)

    def publish_ask(self, topic: str, message: Any) -> list:
        """Deliver and collect every subscriber's reply
        (EventSrv.scala:23-26 ``publishAsk``)."""
        return [fn(message) for fn in list(self._subs.get(topic, ()))]


class DurableEventSrv(EventSrv):
    """Cross-process pub/sub over a shared filesystem — the closest batch
    analog of the reference's CLUSTER-wide DistributedPubSub
    (EventSrv.scala:14-31): the in-process tier above still delivers
    synchronously to local subscribers, and every publish is ALSO
    appended to a per-topic JSONL log under ``root`` that any other
    process (another driver, a later job in the pipeline, a monitor)
    can drain.

    Design points for shared storage:

    * **append-only logs** — one JSON line per event via a single
      ``write`` on an ``O_APPEND`` descriptor (atomic for sane line
      sizes on POSIX; on object stores, swap the transport for the
      streaming source below).
    * **consumer offsets** — ``poll(topic, consumer)`` returns events
      past the consumer's committed byte offset; the commit happens
      AFTER the batch is processed — implicitly at the start of the
      NEXT ``poll`` from the same instance, or explicitly via
      :meth:`ack`.  A consumer that crashes between poll and
      processing therefore sees the batch again on restart
      (at-least-once; idempotent handling is the consumer's job, as
      with any replayed log).
    * **Spark-native tail** — the log directory doubles as a Structured
      Streaming source: ``spark.readStream.schema(...).json(topic_dir)``
      turns commit notifications into a stream any pipeline stage can
      join — the engine's own machinery, no message broker.

    Topic names may contain ``:`` (``store:<label>``); they map to
    directory-safe names by replacing separators.
    """

    def __init__(self, root: str):
        import os

        super().__init__()
        self.root = root
        # offsets read-but-not-yet-committed, keyed (topic, consumer):
        # in-memory ONLY, so a crash before ack/next-poll redelivers
        self._pending: dict[tuple[str, str], int] = {}
        os.makedirs(root, exist_ok=True)

    def _topic_dir(self, topic: str) -> str:
        import os

        d = os.path.join(self.root, topic.replace(":", "__").replace("/", "__"))
        os.makedirs(d, exist_ok=True)
        return d

    def _log(self, topic: str) -> str:
        import os

        return os.path.join(self._topic_dir(topic), "events.jsonl")

    def publish(self, topic: str, message: Any) -> None:
        import json
        import os

        line = (json.dumps({"topic": topic, "message": message}) + "\n").encode()
        fd = os.open(self._log(topic), os.O_WRONLY | os.O_CREAT | os.O_APPEND, 0o644)
        try:
            os.write(fd, line)
        finally:
            os.close(fd)
        super().publish(topic, message)

    def _off_path(self, topic: str, consumer: str) -> str:
        import os

        return os.path.join(self._topic_dir(topic), f"_offset.{consumer}")

    def ack(self, topic: str, consumer: str = "default") -> None:
        """Commit the offset of the batch returned by the last ``poll``
        — the explicit form of the implicit ack the next ``poll``
        performs.  Call it after processing when the consumer will not
        poll again soon (otherwise a crash would redeliver the already-
        processed batch, which at-least-once permits but wastes work)."""
        key = (topic, consumer)
        pend = self._pending.pop(key, None)
        if pend is not None:
            with open(self._off_path(topic, consumer), "w") as f:
                f.write(str(pend))

    def poll(self, topic: str, consumer: str = "default", max_events: int | None = None) -> list:
        """Drain events appended since this consumer's last COMMITTED
        offset.  The returned batch is committed only at the next
        ``poll`` (or an explicit :meth:`ack`), so a consumer that
        crashes after poll but before processing gets the batch again
        on restart — at-least-once, not at-most-once."""
        import json
        import os

        self.ack(topic, consumer)  # previous batch survived processing
        log = self._log(topic)
        off_path = self._off_path(topic, consumer)
        offset = 0
        if os.path.exists(off_path):
            with open(off_path) as f:
                offset = int(f.read().strip() or 0)
        if not os.path.exists(log):
            return []
        out = []
        with open(log, "rb") as f:
            f.seek(offset)
            for raw in f:
                if not raw.endswith(b"\n"):
                    break  # torn tail write: leave for the next poll
                out.append(json.loads(raw)["message"])
                offset += len(raw)
                if max_events is not None and len(out) >= max_events:
                    break
        if out:
            self._pending[(topic, consumer)] = offset
        return out
