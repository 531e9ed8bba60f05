"""Canonical pyarrow schemas + schema-evolution operations.

The reference keeps a DDL-driven "active schema" (loadActiveSchema,
CHANGES.txt:57) versioned into a schema-history table (CHANGES.txt:45-46);
row events are interpreted against the version active at their binlog
position. Here a schema version is a plain ``pyarrow.Schema`` plus a JSON
manifest; evolution ops are ``add_column`` / ``rename_column`` /
``drop_column`` applied in ``seq`` order.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import pyarrow as pa

# Lake-table (converged transcript) schema, pinned by BASELINE.json input_hint.
KEY_COLUMNS = ["conv_id", "turn_idx"]

CANONICAL_SCHEMA_V1 = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# v2 = v1 + `tool` (added by the mid-stream DDL event in the default fixtures;
# the reference analog is a DDL statement replayed onto the active schema).
CANONICAL_SCHEMA_V2 = CANONICAL_SCHEMA_V1.append(pa.field("tool", pa.string()))

# Changelog ("binlog") schema — FIXTURES.md §2. `ddl` is null except op='DDL'.
CHANGELOG_SCHEMA = pa.schema(
    [
        pa.field("seq", pa.int64()),
        pa.field("txn_id", pa.int64()),
        pa.field("op", pa.string()),
        pa.field("schema_ver", pa.int32()),
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
        pa.field("ddl", pa.string()),
    ]
)

# Changelog columns that are engine metadata rather than row payload.
META_COLUMNS = ["seq", "txn_id", "op", "schema_ver", "ddl"]

_TYPE_NAMES = {
    "string": pa.string(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float64": pa.float64(),
    "binary": pa.binary(),
    "timestamp[us]": pa.timestamp("us"),
    "bool": pa.bool_(),
}


def type_from_name(name: str) -> pa.DataType:
    return _TYPE_NAMES[name]


def type_to_name(t: pa.DataType) -> str:
    for name, typ in _TYPE_NAMES.items():
        if typ == t:
            return name
    raise KeyError(str(t))


@dataclass
class SchemaVersion:
    """One entry in the schema history (reference: per-schema history table,
    CHANGES.txt:45-46). ``renames`` maps old→new column names accumulated
    since v1 so old-version batches can be rewritten forward."""

    version: int
    schema: pa.Schema
    renames: dict[str, str] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "fields": [[f.name, type_to_name(f.type)] for f in self.schema],
                "renames": self.renames,
            },
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, s: str) -> "SchemaVersion":
        d = json.loads(s)
        return cls(
            version=d["version"],
            schema=pa.schema([pa.field(n, type_from_name(t)) for n, t in d["fields"]]),
            renames=dict(d.get("renames", {})),
        )


def apply_ddl(prev: SchemaVersion, ddl_json: str) -> SchemaVersion:
    """Apply one DDL event to a schema version, producing the next version.

    Reference analog: DDL query events replayed onto the active schema and
    snapshotted per version (CHANGES.txt:117, 45-46, 57).
    """
    ddl = json.loads(ddl_json)
    action = ddl["action"]
    fields = list(prev.schema)
    renames = dict(prev.renames)
    if action == "add_column":
        if ddl["name"] in prev.schema.names:
            raise ValueError(f"add_column: {ddl['name']} already exists")
        fields.append(pa.field(ddl["name"], type_from_name(ddl.get("type", "string"))))
        # The name may have been freed earlier by a rename or a drop of a
        # rename destination. From this version on it denotes a NEW
        # column, so any rename entry touching it must go — otherwise
        # name-based conformance misroutes the new column (src match) or
        # resurrects renamed-away data into it (dst match). Files written
        # under OLDER versions are mapped by the stepwise
        # ``evolve_table_from`` path, which doesn't use this map.
        renames = {k: v for k, v in renames.items()
                   if k != ddl["name"] and v != ddl["name"]}
    elif action == "rename_column":
        src, dst = ddl["from"], ddl["to"]
        idx = prev.schema.get_field_index(src)
        if idx < 0:
            raise ValueError(f"rename_column: {src} not found")
        fields[idx] = pa.field(dst, fields[idx].type)
        # collapse chains old→src→dst
        for k, v in list(renames.items()):
            if v == src:
                renames[k] = dst
        renames[src] = dst
    elif action == "drop_column":
        if ddl["name"] in KEY_COLUMNS:
            raise ValueError("cannot drop a key column")
        fields = [f for f in fields if f.name != ddl["name"]]
    elif action == "alter_type":
        # MySQL ALTER TABLE ... MODIFY col NEWTYPE: the column keeps its
        # name and data, converted to the new type (sequential cast —
        # each ALTER casts from the column's CURRENT type, so chains
        # like int32→int64→string compose step by step).
        name = ddl["name"]
        if name in KEY_COLUMNS:
            raise ValueError("cannot alter a key column's type")
        idx = prev.schema.get_field_index(name)
        if idx < 0:
            raise ValueError(f"alter_type: {name} not found")
        fields[idx] = pa.field(name, type_from_name(ddl["type"]))
    else:
        raise ValueError(f"unknown DDL action {action!r}")
    return SchemaVersion(version=prev.version + 1, schema=pa.schema(fields), renames=renames)


# Parquet schema-metadata key recording the schema version a state file
# was WRITTEN under. Name-based conformance is ambiguous once a column
# name is dropped and later re-added (or freed by a rename and reused):
# the stamp + the persisted version history make the mapping exact.
STATE_VERSION_META = b"rayrep_state_version"


def stamp_version(table: pa.Table, version: int) -> pa.Table:
    md = dict(table.schema.metadata or {})
    md[STATE_VERSION_META] = str(int(version)).encode()
    return table.replace_schema_metadata(md)


def stamped_version(table: pa.Table) -> int | None:
    v = (table.schema.metadata or {}).get(STATE_VERSION_META)
    return int(v) if v is not None else None


def evolve_table_from(
    table: pa.Table,
    from_version: int,
    target: SchemaVersion,
    history: dict[int, SchemaVersion],
) -> pa.Table:
    """Version-aware ``evolve_table``: replay the schema steps between
    ``from_version`` and ``target`` on the physical columns, so a column
    DROPPED mid-history never leaks its old data into a later re-add of
    the same name (MySQL DROP discards data), a name freed by a rename
    can be reused safely, and type ALTERs apply sequentially (each cast
    from the column's then-current type, MySQL MODIFY semantics).
    Exactly one DDL separates consecutive versions, so diffing adjacent
    field-name sets recovers rename/drop/add and diffing same-name field
    types recovers an alter, unambiguously. Falls back to name-based
    ``evolve_table`` if the history doesn't cover the range (legacy
    lakes)."""
    for v in range(from_version, target.version):
        prev, nxt = history.get(v), history.get(v + 1)
        if prev is None or nxt is None:
            return evolve_table(table, target)
        pn = [f.name for f in prev.schema]
        nn = [f.name for f in nxt.schema]
        removed = [c for c in pn if c not in nn]
        added = [c for c in nn if c not in pn]
        if len(removed) == 1 and len(added) == 1:       # rename step
            src, dst = removed[0], added[0]
            if src in table.column_names:
                table = table.rename_columns(
                    [dst if c == src else c for c in table.column_names]
                )
        elif removed:                                    # drop step
            if removed[0] in table.column_names:
                table = table.drop_columns([removed[0]])
        elif not added:                                  # alter_type step
            for f in nxt.schema:
                pi = prev.schema.get_field_index(f.name)
                if (pi >= 0 and prev.schema.field(pi).type != f.type
                        and f.name in table.column_names):
                    i = table.column_names.index(f.name)
                    table = table.set_column(
                        i, pa.field(f.name, f.type),
                        table.column(i).cast(f.type),
                    )
        # add step: nothing — the final projection null-fills
    # final projection without the cumulative rename map (steps already
    # applied): null-fill missing, drop unknown, cast, canonical order
    return evolve_table(
        table, SchemaVersion(version=target.version, schema=target.schema)
    )


def evolve_table(table: pa.Table, target: SchemaVersion) -> pa.Table:
    """Rewrite an Arrow table (possibly produced under an older schema
    version) to the target canonical schema: apply renames, add missing
    columns as nulls, drop unknown columns, cast types.

    This is the columnar analog of the reference's AugmentedRow construction
    (raw row image joined with the active schema, CHANGES.txt:87): vectorized,
    zero-copy where possible, never per-row.
    """
    cols: dict[str, pa.ChunkedArray] = {}
    present = set(table.column_names)
    for old, new in target.renames.items():
        if old in present and new not in present:
            table = table.rename_columns(
                [new if c == old else c for c in table.column_names]
            )
            present = set(table.column_names)
    n = table.num_rows
    for fld in target.schema:
        if fld.name in present:
            col = table.column(fld.name)
            if col.type != fld.type:
                col = col.cast(fld.type)
            cols[fld.name] = col
        else:
            cols[fld.name] = pa.chunked_array([pa.nulls(n, fld.type)])
    return pa.table(cols, schema=target.schema)
