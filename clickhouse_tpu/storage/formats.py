"""Input/output formats.

Analog of the reference's FormatFactory + ~70 formats
(src/Formats/FormatFactory.h, src/Processors/Formats/).  Columnar formats
(Parquet/Arrow/ORC) ride pyarrow; text formats (CSV/TSV/JSONEachRow) ride
pandas/stdlib.  Everything lands in host pydicts that feed the columnar
ingest path (dictionary-encoding strings on the way to the device).
"""
from __future__ import annotations

import csv
import io
import json
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..core import dtypes as dt
from ..core.errors import AnalysisError, NotImplementedError_

__all__ = ["read_file", "write_file", "detect_format", "confine_path",
           "FORMATS", "format_rows_text"]

FORMATS = ["Parquet", "CSV", "CSVWithNames", "TSV", "TSVWithNames",
           "JSONEachRow", "Native", "Values", "Arrow", "ORC", "Avro",
           "RowBinary", "RowBinaryWithNamesAndTypes"]


def confine_path(path: str, root: Optional[str]) -> str:
    """Resolve and confine a user-supplied path to ``root``.

    The user_files_path restriction of the reference
    (src/Storages/StorageFile.cpp checkCreationIsAllowed): file()/INFILE/
    OUTFILE/BACKUP paths must stay inside the configured root.  An empty
    root means unrestricted (clickhouse-local behavior).  Relative paths
    resolve against the root."""
    if not root:
        return path
    rootr = os.path.realpath(root)
    cand = path if os.path.isabs(path) else os.path.join(rootr, path)
    # realpath the deepest existing ancestor so symlink escapes are caught
    # even for not-yet-existing output files
    head, tail = cand, ""
    while head and not os.path.exists(head):
        head, last = os.path.split(head)
        tail = os.path.join(last, tail) if tail else last
        if not last:
            break
    resolved = os.path.join(os.path.realpath(head), tail) if tail \
        else os.path.realpath(cand)
    if resolved != rootr and not resolved.startswith(rootr + os.sep):
        raise AnalysisError(
            f"Path '{path}' is outside the allowed user_files_path")
    return resolved


def detect_format(path: str) -> str:
    ext = os.path.splitext(path)[1].lower()
    return {
        ".parquet": "Parquet", ".pq": "Parquet", ".csv": "CSVWithNames",
        ".tsv": "TSVWithNames", ".json": "JSONEachRow",
        ".jsonl": "JSONEachRow", ".ndjson": "JSONEachRow",
        ".native": "Native", ".arrow": "Arrow",
        ".orc": "ORC", ".avro": "Avro",
    }.get(ext, "CSVWithNames")


def read_file(path: str, fmt: Optional[str] = None,
              ) -> Dict[str, np.ndarray]:
    fmt = fmt or detect_format(path)
    f = fmt.lower()
    if f == "parquet":
        import pyarrow.parquet as pq
        table = pq.read_table(path)
        return _arrow_to_pydict(table)
    if f == "arrow":
        import pyarrow as pa
        with pa.memory_map(path) as src:
            table = pa.ipc.open_file(src).read_all()
        return _arrow_to_pydict(table)
    if f == "orc":
        import pyarrow.orc as orc
        return _arrow_to_pydict(orc.read_table(path))
    if f == "avro":
        from .avro_format import read_avro
        with open(path, "rb") as fh:
            return read_avro(fh.read())
    if f in ("csv", "csvwithnames", "tsv", "tsvwithnames"):
        import pandas as pd
        sep = "\t" if f.startswith("tsv") else ","
        header = 0 if f.endswith("withnames") else None
        df = pd.read_csv(path, sep=sep, header=header)
        if header is None:
            df.columns = [f"c{i + 1}" for i in range(len(df.columns))]
        return {str(c): _pandas_col(df[c]) for c in df.columns}
    if f == "jsoneachrow":
        rows = []
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
        if not rows:
            return {}
        cols: Dict[str, list] = {k: [] for k in rows[0]}
        for r in rows:
            for k in cols:
                cols[k].append(r.get(k))
        return {k: np.asarray(v, dtype=object) for k, v in cols.items()}
    if f == "native":
        from .native_format import read_native_file
        return read_native_file(path)
    if f == "rowbinarywithnamesandtypes":
        from .rowbinary import read_rowbinary
        with open(path, "rb") as fh:
            return read_rowbinary(fh.read())
    if f == "rowbinary":
        raise NotImplementedError_(
            "bare RowBinary input needs a schema; use "
            "RowBinaryWithNamesAndTypes")
    raise NotImplementedError_(f"Input format '{fmt}' is not supported yet")


def _unescape_tsv(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            out.append({"t": "\t", "n": "\n", "r": "\r", "\\": "\\",
                        "0": "\0", "b": "\b", "f": "\f",
                        "'": "'", '"': '"'}.get(s[i + 1], s[i + 1]))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def parse_inline(text: str, fmt: str, table,
                 columns: Optional[List[str]] = None
                 ) -> Dict[str, np.ndarray]:
    """Parse INSERT ... FORMAT <fmt> inline data (the data lines that
    follow the statement in a script — reference clickhouse-client reads
    them from the same stream, ClientBase::processInsertQuery)."""
    f = fmt.lower()
    names = list(columns) if columns else list(table.schema.keys())
    lines = [ln for ln in text.split("\n")]
    while lines and not lines[0].strip():
        lines.pop(0)
    while lines and not lines[-1].strip():
        lines.pop()
    rows: List[List] = []
    if f in ("csv", "csvwithnames", "csvwithnamesandtypes"):
        import csv as _csv
        import io
        rdr = _csv.reader(io.StringIO("\n".join(lines)))
        rows = [r for r in rdr if r]
        if f == "csvwithnames" and rows:
            names = rows.pop(0)
        elif f == "csvwithnamesandtypes" and len(rows) >= 2:
            names = rows.pop(0)
            rows.pop(0)
    elif f in ("tsv", "tabseparated", "tsvwithnames",
               "tabseparatedwithnames", "tsvwithnamesandtypes",
               "tabseparatedwithnamesandtypes", "tsvraw",
               "tabseparatedraw"):
        raw = f.endswith("raw")
        for ln in lines:
            cells = ln.split("\t")
            rows.append([c if raw else
                         (None if c == r"\N" else _unescape_tsv(c))
                         for c in cells])
        if "withnames" in f and rows:
            names = [str(x) for x in rows.pop(0)]
            if "andtypes" in f and rows:
                rows.pop(0)
    elif f == "jsoneachrow":
        cols: Dict[str, list] = {}
        recs = []
        for ln in lines:
            ln = ln.strip()
            if ln:
                recs.append(json.loads(ln))
        keys = list(recs[0].keys()) if recs else names
        for k in keys:
            cols[k] = [r.get(k) for r in recs]
        return {k: np.asarray(v, dtype=object) for k, v in cols.items()}
    elif f == "values":
        from ..sql.parser import parse as _parse
        st = _parse(f"INSERT INTO {table.name} VALUES " + " ".join(lines))
        from ..sql import ast as _ast
        for rvals in st.values or []:
            row = []
            for e in rvals:
                if isinstance(e, _ast.Literal):
                    row.append(e.value)
                elif isinstance(e, _ast.FuncCall) and e.name == "negate" \
                        and isinstance(e.args[0], _ast.Literal):
                    row.append(-e.args[0].value)
                elif isinstance(e, _ast.FuncCall) and e.name == "array":
                    row.append([a.value for a in e.args
                                if isinstance(a, _ast.Literal)])
                else:
                    raise NotImplementedError_(
                        "complex expression in inline VALUES data")
            rows.append(row)
    else:
        raise NotImplementedError_(
            f"Inline data for format '{fmt}' is not supported yet")
    if len(names) < max((len(r) for r in rows), default=0):
        raise NotImplementedError_("inline data has more cells than "
                                   "columns")
    cols2: Dict[str, list] = {n: [] for n in names}
    for r in rows:
        for j, n in enumerate(names):
            v = r[j] if j < len(r) else None
            cols2[n].append(v)
    out: Dict[str, np.ndarray] = {}
    from ..core import dtypes as _dt
    for n, vals in cols2.items():
        t = table.schema.get(n) if hasattr(table.schema, "get") else None
        if t is not None and not t.is_dictionary \
                and t.np_dtype is not None \
                and np.issubdtype(t.np_dtype, np.number):
            conv = []
            base = _dt.remove_nullable(t)
            isint = np.issubdtype(base.np_dtype, np.integer)
            for v in vals:
                if v is None or v == "":
                    conv.append(None if t.nullable else 0)
                elif isinstance(v, str):
                    conv.append(int(float(v)) if isint and (
                        "." in v or "e" in v or "E" in v)
                        else (int(v) if isint else float(v)))
                else:
                    conv.append(v)
            out[n] = np.asarray(conv, object)
        else:
            out[n] = np.asarray(vals, object)
    return out


def write_file(path: str, data: Dict[str, np.ndarray],
               types: Optional[List[Tuple[str, str]]] = None,
               fmt: Optional[str] = None) -> None:
    fmt = fmt or detect_format(path)
    f = fmt.lower()
    if f == "parquet":
        import pyarrow as pa
        import pyarrow.parquet as pq
        pq.write_table(pa.table(_to_arrow_cols(data)), path)
        return
    if f in ("csv", "csvwithnames", "tsv", "tsvwithnames"):
        import pandas as pd
        sep = "\t" if f.startswith("tsv") else ","
        pd.DataFrame(data).to_csv(path, sep=sep, index=False,
                                  header=f.endswith("withnames"))
        return
    if f == "jsoneachrow":
        names = list(data.keys())
        n = len(next(iter(data.values()))) if data else 0
        with open(path, "w") as fh:
            for i in range(n):
                fh.write(json.dumps({k: _py(data[k][i]) for k in names}))
                fh.write("\n")
        return
    if f == "native":
        from .native_format import write_native_file
        write_native_file(path, data, types)
        return
    if f == "orc":
        import pyarrow as pa
        import pyarrow.orc as orc
        orc.write_table(pa.table(_to_arrow_cols(data)), path)
        return
    if f == "avro":
        from .avro_format import write_avro
        with open(path, "wb") as fh:
            fh.write(write_avro(data, types))
        return
    if f in ("rowbinary", "rowbinarywithnamesandtypes"):
        from .rowbinary import write_rowbinary
        if types is None:
            types = [(k, _infer_type_name(v)) for k, v in data.items()]
        with open(path, "wb") as fh:
            fh.write(write_rowbinary(
                data, types, with_names_types=f.endswith("types")))
        return
    raise NotImplementedError_(f"Output format '{fmt}' is not supported yet")


def _infer_type_name(v: np.ndarray) -> str:
    v = np.asarray(v)
    if v.dtype == object:
        non_null = [x for x in v if x is not None]
        nullable = len(non_null) < len(v)
        if all(isinstance(x, str) for x in non_null):
            base = "String"
        elif all(isinstance(x, (int, np.integer)) for x in non_null):
            base = "Int64"
        else:
            base = "Float64"
        return f"Nullable({base})" if nullable else base
    kind = {"i": "Int", "u": "UInt", "f": "Float"}.get(v.dtype.kind)
    if kind is None:
        return "String"
    return f"{kind}{v.dtype.itemsize * 8}"


def _py(v):
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, np.str_):
        return str(v)
    return v


def _pandas_col(series) -> np.ndarray:
    import pandas as pd
    if series.dtype == object or pd.api.types.is_string_dtype(series):
        vals = series.to_numpy(dtype=object)
        mask = pd.isna(series).to_numpy()
        if mask.any():
            vals = vals.copy()
            vals[mask] = None
        return vals
    if pd.api.types.is_float_dtype(series) or pd.api.types.is_integer_dtype(series):
        return series.to_numpy()
    if pd.api.types.is_bool_dtype(series):
        return series.to_numpy().astype(np.uint8)
    if pd.api.types.is_datetime64_any_dtype(series):
        return (series.astype("int64") // 10**9).to_numpy()
    return series.to_numpy(dtype=object)


def _arrow_to_pydict(table) -> Dict[str, np.ndarray]:
    import pyarrow as pa
    out = {}
    for name, col in zip(table.column_names, table.columns):
        t = col.type
        if pa.types.is_string(t) or pa.types.is_large_string(t) \
                or pa.types.is_binary(t) or pa.types.is_dictionary(t):
            out[name] = np.asarray(col.to_pylist(), dtype=object)
        elif pa.types.is_timestamp(t):
            out[name] = (col.cast(pa.int64()).to_numpy(zero_copy_only=False)
                         // 10**(9 if t.unit == "ns" else
                                 6 if t.unit == "us" else
                                 3 if t.unit == "ms" else 0))
        elif pa.types.is_boolean(t):
            out[name] = col.to_numpy(zero_copy_only=False).astype(np.uint8)
        else:
            arr = col.to_numpy(zero_copy_only=False)
            if col.null_count:
                vals = np.asarray(col.to_pylist(), dtype=object)
                out[name] = vals
            else:
                out[name] = arr
    return out


def _to_arrow_cols(data: Dict[str, np.ndarray]):
    import pyarrow as pa
    cols = {}
    for k, v in data.items():
        v = np.asarray(v)
        if v.dtype == object:
            cols[k] = pa.array(list(v))
        else:
            cols[k] = pa.array(v)
    return cols


def format_rows_text(data: Dict[str, np.ndarray], fmt: str) -> str:
    """Render a result in a text output format (FORMAT clause analog)."""
    f = fmt.lower()
    names = list(data.keys())
    n = len(next(iter(data.values()))) if data else 0
    buf = io.StringIO()
    if f in ("csv", "csvwithnames", "tsv", "tsvwithnames"):
        sep = "\t" if f.startswith("tsv") else ","
        w = csv.writer(buf, delimiter=sep, lineterminator="\n")
        if f.endswith("withnames"):
            w.writerow(names)
        for i in range(n):
            w.writerow([_py(data[k][i]) for k in names])
        return buf.getvalue()
    if f == "jsoneachrow":
        for i in range(n):
            buf.write(json.dumps({k: _py(data[k][i]) for k in names}))
            buf.write("\n")
        return buf.getvalue()
    if f == "values":
        rows = []
        for i in range(n):
            cells = []
            for k in names:
                v = _py(data[k][i])
                cells.append("NULL" if v is None
                             else f"'{v}'" if isinstance(v, str) else str(v))
            rows.append("(" + ",".join(cells) + ")")
        return ",".join(rows)
    raise NotImplementedError_(f"Text format '{fmt}' is not supported yet")
