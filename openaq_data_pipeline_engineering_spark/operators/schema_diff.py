"""Schema-evolution diff: compare two DataFrame schemas and classify
every change as breaking or additive.

The reference's schema story is crawler re-inference plus a pinned
15-column test (reference tests/test_glue_output_schema.py:44-60) —
drift is detected only when a downstream query breaks. This operator
makes the contract explicit: run it between yesterday's mart and
today's candidate before publishing, and gate the write on
`breaking == 0`.

Classification:
- removed column                  -> breaking
- type change                     -> breaking
- nullable -> non-nullable        -> additive (tightening never breaks
                                     readers; the reverse direction,
                                     non-nullable -> nullable, breaks
                                     consumers that relied on NOT NULL)
- added column                    -> additive

Driver-side metadata only (schemas, not data) — O(columns), no jobs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class SchemaChange:
    column: str
    change: str  # added | removed | type_changed | nullability_changed
    old: str | None
    new: str | None
    breaking: bool


def schema_diff(old: DataFrame, new: DataFrame) -> list[SchemaChange]:
    """Ordered change list between two schemas (old -> new)."""
    old_f = {f.name: f for f in old.schema.fields}
    new_f = {f.name: f for f in new.schema.fields}
    changes: list[SchemaChange] = []
    for name, f in old_f.items():
        if name not in new_f:
            changes.append(
                SchemaChange(name, "removed", f.dataType.simpleString(),
                             None, breaking=True)
            )
            continue
        g = new_f[name]
        if f.dataType != g.dataType:
            changes.append(
                SchemaChange(
                    name,
                    "type_changed",
                    f.dataType.simpleString(),
                    g.dataType.simpleString(),
                    breaking=True,
                )
            )
        elif f.nullable != g.nullable:
            changes.append(
                SchemaChange(
                    name,
                    "nullability_changed",
                    f"nullable={f.nullable}",
                    f"nullable={g.nullable}",
                    # loosening (False -> True) breaks NOT NULL readers
                    breaking=(not f.nullable and g.nullable),
                )
            )
    for name, g in new_f.items():
        if name not in old_f:
            changes.append(
                SchemaChange(name, "added", None,
                             g.dataType.simpleString(), breaking=False)
            )
    return changes


def is_compatible(old: DataFrame, new: DataFrame) -> bool:
    """True when every change is additive (safe to publish)."""
    return not any(c.breaking for c in schema_diff(old, new))
