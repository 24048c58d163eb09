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
