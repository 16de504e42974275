"""Autoscaling advisor: desired-instance calculus from Kafka message lag.

Reference behavior: /root/reference/docs/autoscaling.md — the leader
combines per-application excess message lag (lag beyond the declared
``maximumMessageLag``) with instance capacity derived from
``work.averageMessageTimeEstimate`` (capacity = 1000/avgMs msg/s over the
60 s work interval, docs/configuration.md:10,35), bounded by each app's
parallelism ceiling (the highest partition count of any consumed topic)
and the ``maximumAppsPerInstance`` packing limit.

On Spark this calculus is *advisory*: executors replace the instance
fleet and `spark.dynamicAllocation` handles scale-out, but the same
function drives `maxOffsetsPerTrigger` sizing and KEDA-style external
scalers for the streaming runtime (the reference publishes
{desired, running} messages for exactly that purpose).

Pure function — no I/O; operates on the same document shape the reference
uses for its lag snapshots.
"""

from __future__ import annotations

import math
from typing import Any, Mapping

__all__ = ["desired_instances", "excess_lag"]

# design-capacity defaults (docs/configuration.md:10,35,39)
DEFAULT_AVERAGE_MESSAGE_TIME_MS = 20
DEFAULT_MAX_APPS_PER_INSTANCE = 50
DEFAULT_WORK_INTERVAL_MS = 60_000


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


def desired_instances(
    message_lag_per_application: Mapping[str, Mapping[str, Mapping[Any, int]]],
    maximum_message_lag: Mapping[str, Mapping[str, int]] | None,
    running_instances_with_applications: Mapping[str, list] | None,
    average_message_time_estimate: float = DEFAULT_AVERAGE_MESSAGE_TIME_MS,
    maximum_apps_per_instance: int = DEFAULT_MAX_APPS_PER_INSTANCE,
    work_interval_ms: int = DEFAULT_WORK_INTERVAL_MS,
) -> int:
    """Desired number of runtime instances.

    The calculus, mirroring the documented behavior:

    1. Each application needs ``r`` *replicas* (instances running it):
       one by default; a lagging app adds the instances required to
       digest its excess within one work interval at 1000/avgMs msg/s
       each, on top of the replicas already serving it.
    2. *Parallelism ceiling*: replicas beyond the app's highest
       topic-partition count would idle in the consumer group, so
       ``r ≤ max partitions``.
    3. *Packing*: instances hold at most ``maximum_apps_per_instance``
       app slots, so the fleet must provide ``ceil(Σ r / maxApps)``
       instances — and at least ``max r``, since one app's replicas
       live on distinct instances.

    The result is a *target*, not a delta: fewer running instances than
    desired means scale up, more means scale down (the reference
    publishes {desired, running} for exactly this comparison).
    """
    maximum_message_lag = maximum_message_lag or {}
    running = dict(running_instances_with_applications or {})
    apps = set(message_lag_per_application)
    for insts in running.values():
        apps.update(insts)
    if not apps:
        return 1

    capacity_per_interval = (
        (1000.0 / max(average_message_time_estimate, 1e-9))
        * (work_interval_ms / 1000.0)
    )

    total_slots = 0
    max_replicas = 1
    for app in apps:
        topics = message_lag_per_application.get(app, {})
        allowed = maximum_message_lag.get(app)
        need = 0
        if allowed:
            excess = excess_lag(topics, allowed)
            if excess > 0:
                need = math.ceil(excess / capacity_per_interval)
        max_partitions = max(
            (len(parts) for parts in topics.values()), default=1
        )
        running_this_app = sum(
            1 for insts in running.values() if app in insts
        )
        replicas = min(max(running_this_app + need, 1), max_partitions) \
            if need else 1
        total_slots += replicas
        max_replicas = max(max_replicas, replicas)

    packing = math.ceil(total_slots / max(maximum_apps_per_instance, 1))
    return max(packing, max_replicas)
