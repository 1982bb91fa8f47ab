"""Window types — the schema of a stream trigger.

Reference: ``windows.py:3-37`` defines ``MetadataField`` /
``WindowType`` and four concrete types; ``simulator/main.py:104-112``
emits EveryMinute; ``processor/main.py:356-369`` emits the derived
per-trip type. In the Spark engine a window type is a registry entry:
its metadata fields become grouping-key columns of the fused plan
(SURVEY.md §1.1), not gRPC message fields.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class MetadataField:
    name: str
    description: str = ""


@dataclass(frozen=True)
class WindowType:
    name: str
    version: str
    description: str = ""
    metadata_fields: tuple[MetadataField, ...] = ()

    @property
    def keys(self) -> tuple[str, ...]:
        return tuple(f.name for f in self.metadata_fields)


# Reference windows.py:7-16 — the two active types.
EVERY_MINUTE = WindowType("EveryMinute", "1.0.0", "Tumbling 60 s window")

EVERY_MINUTE_PER_TRIP_PER_BUS = WindowType(
    "EveryMinutePerTripPerBus",
    "1.0.0",
    "Derived per-(trip,bus,route) 60 s window",
    (MetadataField("trip_id"), MetadataField("bus_id"), MetadataField("route_id")),
)

# Reference windows.py:18-37 — brake-run session window types (consumed
# by the commented brake-window finders, processor/main.py:374-445).
HALT_BRAKE_APPLIED = WindowType(
    "HaltBrakeApplied",
    "1.0.0",
    "Session window spanning a contiguous halt-brake-active run",
    (MetadataField("trip_id"), MetadataField("bus_id"), MetadataField("route_id")),
)

PARK_BRAKE_APPLIED = WindowType(
    "ParkBrakeApplied",
    "1.0.0",
    "Session window spanning a contiguous park-brake-active run",
    (MetadataField("trip_id"), MetadataField("bus_id"), MetadataField("route_id")),
)
