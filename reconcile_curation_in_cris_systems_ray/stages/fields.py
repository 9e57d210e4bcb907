"""Pattern-trie field extraction over nested JSON documents.

Reimplements (behavior, not code) the reference extractor M1/M2/M7
(``openalex-fast-field-parse/src/main.rs:400-499``): compile
comma/dot field specs into a trie, traverse each JSON document, emit
one row per matched leaf with both the index-free ``field_name``
("a.b.c") and the concrete ``subfield_path`` with array indices
("a[0].b[2].c").  Differences by design:

- arrays are traversed transparently (the reference needs a static
  SCHEMA_STRUCTURE map to know where to insert ``[]`` nodes; a typed
  engine can just look at the value);
- values are stringified: scalars via ``str`` (bools lowercased like
  JSON), nested leftovers JSON-serialized — matching the reference's
  stringly-typed FieldData rows (``main.rs:453-462``).

The trie is built once per actor (ST2 pattern) and applied per batch.
"""

from __future__ import annotations

import json

import pyarrow as pa


def parse_field_specifications(spec: str) -> list[list[str]]:
    """``"a.b, c"`` -> ``[["a","b"],["c"]]`` (reference M2)."""
    out = []
    for part in spec.split(","):
        path = [seg.strip() for seg in part.strip().split(".") if seg.strip()]
        if path:
            out.append(path)
    return out


class PatternTrie:
    __slots__ = ("children", "terminal")

    def __init__(self):
        self.children: dict[str, "PatternTrie"] = {}
        self.terminal = False

    @classmethod
    def build(cls, field_specs: list[list[str]]) -> "PatternTrie":
        root = cls()
        for path in field_specs:
            node = root
            for seg in path:
                node = node.children.setdefault(seg, cls())
            node.terminal = True
        return root


def _stringify(value) -> str:
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (dict, list)):
        return json.dumps(value, separators=(",", ":"), sort_keys=True)
    if value is None:
        return ""
    return str(value)


def _traverse(node: PatternTrie, value, field_parts: list[str],
              path_parts: list[str], out: list[tuple[str, str, str]]):
    if isinstance(value, list):
        # transparent array traversal: indices go to subfield_path only
        for i, item in enumerate(value):
            if path_parts:
                saved = path_parts[-1]
                path_parts[-1] = f"{saved}[{i}]"
                _traverse(node, item, field_parts, path_parts, out)
                path_parts[-1] = saved
            else:
                path_parts.append(f"[{i}]")
                _traverse(node, item, field_parts, path_parts, out)
                path_parts.pop()
        return
    if node.terminal:
        out.append((".".join(field_parts), ".".join(path_parts),
                    _stringify(value)))
        # a terminal may still have deeper children; fall through
    if not node.children or not isinstance(value, dict):
        return
    for seg, child in node.children.items():
        if seg == "*":
            for key, sub in value.items():
                field_parts.append(seg)
                path_parts.append(key)
                _traverse(child, sub, field_parts, path_parts, out)
                field_parts.pop()
                path_parts.pop()
        elif seg in value:
            field_parts.append(seg)
            path_parts.append(seg)
            _traverse(child, value[seg], field_parts, path_parts, out)
            field_parts.pop()
            path_parts.pop()


def extract_fields_from_doc(doc, trie: PatternTrie) -> list[tuple[str, str, str]]:
    out: list[tuple[str, str, str]] = []
    _traverse(trie, doc, [], [], out)
    return out


class FieldExtractor:
    """Actor-pool batch callable: JSON column -> exploded field rows.

    Output: (id columns passthrough, field_name, subfield_path, value);
    rows that fail to parse are quarantined via ``parse_error``.
    """

    def __init__(self, field_spec: str, json_col: str = "doc",
                 id_cols: tuple[str, ...] = ("doc_id",)):
        self.trie = PatternTrie.build(parse_field_specifications(field_spec))
        self.json_col = json_col
        self.id_cols = id_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.json_col).to_pylist()
        ids = {c: batch.column(c).to_pylist() for c in self.id_cols}
        out_ids: dict[str, list] = {c: [] for c in self.id_cols}
        fnames, paths, values, errors = [], [], [], []
        for i, raw in enumerate(docs):
            try:
                doc = raw if isinstance(raw, (dict, list)) else json.loads(raw)
                rows = extract_fields_from_doc(doc, self.trie)
                err = None
            except Exception as exc:
                rows = [("", "", "")]
                err = f"{type(exc).__name__}: {exc}"
            for fn, sp, val in rows:
                for c in self.id_cols:
                    out_ids[c].append(ids[c][i])
                fnames.append(fn)
                paths.append(sp)
                values.append(val)
                errors.append(err)
        cols = {c: pa.array(out_ids[c]) for c in self.id_cols}
        cols["field_name"] = pa.array(fnames, pa.string())
        cols["subfield_path"] = pa.array(paths, pa.string())
        cols["value"] = pa.array(values, pa.string())
        cols["parse_error"] = pa.array(errors, pa.string())
        return pa.table(cols)


def extract_fields(ds, field_spec: str, json_col: str = "doc",
                   id_cols: tuple[str, ...] = ("doc_id",),
                   batch_size: int = 1024, concurrency=(1, 8)):
    return ds.map_batches(
        FieldExtractor,
        fn_constructor_kwargs={"field_spec": field_spec,
                               "json_col": json_col, "id_cols": id_cols},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
