"""Autoscaling advisor: desired-instance calculus from Kafka message lag.

Reference behavior: /root/reference/docs/autoscaling.md and
``Work.java`` (`simulate`, `desiredApplicationInstances`,
`desiredInstances` — Work.java:131-199,361-388).  The reference
validates this calculus against 16 golden lag-snapshot fixtures
(src/test/resources/work1.json..work16.json, runner TestWork.java:13-18
asserting ``expected`` vs ``Work.simulate``); ``tests/test_autoscale.py``
replays every fixture through :func:`simulate`.

The calculus (Work.java semantics, replayed exactly):

* capacity = ``1000 div averageMessageTimeEstimate`` messages/second
  per application instance (INTEGER division — Work.java:131-133);
* per application, per topic: the lag summed over the topic's
  partitions beyond the topic's declared ``maximumMessageLag`` needs
  ``ceil(excess / capacity)`` EXTRA instances (Work.java:202-227);
* an application with any outstanding lag needs one base instance; a
  fully drained application scales to zero (``work.scaleToZero``
  defaults true — Work.java:165-190);
* the per-application need is the MAX over its topics, capped by the
  application's parallelism ceiling: the highest partition count of
  any topic it consumes (replicas beyond that would idle in the
  consumer group — Status.maximumAllowedApplicationInstances);
* the fleet needs ``max(largest per-app need, ceil(total app
  instances / maximumAppsPerInstance))`` instances, and at least 1
  (Work.java:153-164).

On Spark this calculus is *advisory*: executors replace the instance
fleet and `spark.dynamicAllocation` handles scale-out, but the same
function drives `maxOffsetsPerTrigger` sizing and KEDA-style external
scalers for the streaming runtime (the reference publishes
{desired, running} messages for exactly that purpose).

Pure functions — no I/O; operate on the same document shape the
reference uses for its lag snapshots.
"""

from __future__ import annotations

from typing import Any, Mapping

__all__ = [
    "capacity_per_second",
    "desired_application_instances",
    "desired_instances",
    "excess_lag",
    "simulate",
]

# design-capacity defaults (docs/configuration.md:10,35,39; Work.java:88,93)
DEFAULT_AVERAGE_MESSAGE_TIME_MS = 20
DEFAULT_MAX_APPS_PER_INSTANCE = 50


def capacity_per_second(average_message_time_ms: int) -> int:
    """Messages one application instance digests per second —
    ``1000 div avgMs``, integer division like the reference
    (Work.java:131-133), clamped to >= 1: a message estimate above
    1000 ms would otherwise yield capacity 0 and crash the excess-lag
    division (the reference carries the same latent
    ArithmeticException; an advisory path should degrade to "one
    message per second per instance", not raise)."""
    return max(1, 1000 // max(int(average_message_time_ms), 1))


def excess_lag(
    lag_per_topic: Mapping[str, Mapping[Any, int]],
    allowed_per_topic: Mapping[str, int],
) -> int:
    """Total lag beyond the allowed maximum, summed over constrained
    topics (unconstrained topics may pile up by design —
    docs/autoscaling.md:3)."""
    total = 0
    for topic, partitions in lag_per_topic.items():
        if topic in allowed_per_topic:
            lag = sum(partitions.values())
            total += max(0, lag - allowed_per_topic[topic])
    return total


def _extra_capacity(excess: int, capacity: int) -> int:
    # Work.java:223-227 — ceil(excess / capacity) in integer arithmetic
    return excess // capacity + (1 if excess > 0 and excess % capacity else 0)


def desired_application_instances(
    message_lag_per_application: Mapping[str, Mapping[str, Mapping[Any, int]]],
    maximum_message_lag: Mapping[str, Mapping[str, int]] | None,
    average_message_time_estimate: int = DEFAULT_AVERAGE_MESSAGE_TIME_MS,
) -> dict[str, int]:
    """Per-application desired instance count
    (Work.desiredApplicationInstances, Work.java:142-190).

    For every application in the lag snapshot:
    ``min(parallelism ceiling, max over topics of (extra capacity for
    the topic's excess lag + base instance))`` — where the base
    instance is 0 when the application has no outstanding lag at all
    (scale-to-zero) and the parallelism ceiling is the highest
    partition count of any consumed topic."""
    maximum_message_lag = maximum_message_lag or {}
    capacity = capacity_per_second(average_message_time_estimate)
    desired: dict[str, int] = {}
    for app, topics in message_lag_per_application.items():
        # parallelism ceiling: most partitions on any one topic
        # (Status.maximumAllowedApplicationInstances; an empty lag map
        # yields 0 — nothing to consume)
        max_allowed = max((len(parts) for parts in topics.values()),
                          default=0)
        total_lag = sum(
            v for parts in topics.values() for v in parts.values()
        )
        allowed = maximum_message_lag.get(app) or {}
        terms = []
        for topic, parts in topics.items():
            lag = sum(parts.values())
            limit = allowed.get(topic)
            excess = lag - limit if isinstance(limit, int) else 0
            extra = _extra_capacity(excess, capacity) if excess > 0 else 0
            terms.append(extra + (0 if total_lag == 0 else 1))
        desired[app] = min(max_allowed, max(terms) if terms else 1)
    return desired


def desired_instances(
    message_lag_per_application: Mapping[str, Mapping[str, Mapping[Any, int]]],
    maximum_message_lag: Mapping[str, Mapping[str, int]] | None,
    running_instances_with_applications: Mapping[str, list] | None = None,
    average_message_time_estimate: int = DEFAULT_AVERAGE_MESSAGE_TIME_MS,
    maximum_apps_per_instance: int = DEFAULT_MAX_APPS_PER_INSTANCE,
) -> int:
    """Desired number of runtime instances (Work.desiredInstances,
    Work.java:153-164): at least the largest single-application need
    (one app's replicas live on distinct instances) and at least
    ``ceil(total app instances / maximumAppsPerInstance)`` (packing),
    and never below 1.

    ``running_instances_with_applications`` is accepted for interface
    parity with the reference's lag snapshot: the *target* does not
    depend on it (it only drives work placement / giveWork), and the
    result is a target, not a delta — fewer running instances than
    desired means scale up, more means scale down."""
    del running_instances_with_applications  # placement-only input
    per_app = desired_application_instances(
        message_lag_per_application,
        maximum_message_lag,
        average_message_time_estimate,
    )
    minimal = max(1, max(per_app.values(), default=1))
    total = sum(per_app.values())
    max_apps = max(int(maximum_apps_per_instance), 1)
    packing = total // max_apps + (1 if total % max_apps else 0)
    return max(minimal, packing)


def simulate(doc: Mapping[str, Any]) -> int:
    """Replay one reference lag-snapshot fixture
    (src/test/resources/work*.json, Work.simulate contract
    Work.java:372-388): the document carries
    ``messageLagPerApplication``, ``maximumMessageLag``,
    ``runningInstancesWithApplications``,
    ``averageMessageTimeEstimate`` and ``maximumAppsPerInstance``;
    returns the desired instance count the fixture's ``expected``
    field asserts."""
    return desired_instances(
        doc["messageLagPerApplication"],
        doc.get("maximumMessageLag"),
        doc.get("runningInstancesWithApplications"),
        doc["averageMessageTimeEstimate"],
        doc["maximumAppsPerInstance"],
    )
