"""PostgreSQL COPY batch writer (S4) and SQLite variant (S5).

Reference: ``_PostgreSQLBatchWriter``
(/root/reference/biocypher/output/write/relational/_postgresql.py:8-329) and
``_SQLiteBatchWriter`` (.../_sqlite.py:4-53). Part files reuse the shared
partitioned-write machinery; the dialect differences are: plain quoting (no
doubling), ``"{a,b}"`` array literals, ``{label}-create_table.sql`` DDL files
instead of header CSVs, and a psql / sqlite3 import script.
"""

from __future__ import annotations

import os

from .neo4j import Neo4jBatchWriter
from .base import BOOL_TYPES, DOUBLE_TYPES, LONG_TYPES, STR_ARRAY, pascal_file_label

def _pg_type(declared) -> str:
    """DATA_TYPE_LOOKUP semantics (reference _postgresql.py:27-37):
    int->INTEGER, long->BIGINT, float/double->NUMERIC, bool->BOOLEAN,
    str[]->VARCHAR[]; everything else VARCHAR."""
    if declared == "long":
        return "BIGINT"
    if declared in LONG_TYPES:
        return "INTEGER"
    if declared in DOUBLE_TYPES:
        return "NUMERIC"
    if declared in BOOL_TYPES:
        return "BOOLEAN"
    if declared in STR_ARRAY:
        return "VARCHAR[]"
    return "VARCHAR"


def _psql_ident(pascal: str) -> str:
    return pascal.replace(".", "_").lower()


class PostgresBatchWriter(Neo4jBatchWriter):
    quote_mode = "plain"
    array_mode = "pg"
    forced_edge_labels_order = None

    def __init__(self, *args, db_user="postgres", db_password="postgres", db_host="localhost", db_port="5432", **kwargs):
        kwargs.setdefault("quote", '"')
        kwargs.setdefault("import_call_bin_prefix", "")
        super().__init__(*args, **kwargs)
        self.db_user = db_user
        self.db_password = db_password
        self.db_host = db_host
        self.db_port = db_port
        self._copy_commands: set[str] = set()

    # edges always carry the _ID column in the Postgres table layout
    def _edge_skip_id(self, label: str) -> bool:
        return False

    def _import_script_name(self) -> str:
        return f"{self.db_name}-import-call.sh"

    def _array_string(self, items) -> str:
        joined = ",".join(str(x) for x in items)
        return f'"{{{joined}}}"'

    def _ddl(self, table: str, columns: list[str]) -> str:
        cmd = ""
        if self.wipe:
            cmd += f"DROP TABLE IF EXISTS {table};\n"
        cmd += f"CREATE TABLE {table}({','.join(columns)});\n"
        return cmd

    def _register_parts(self, pascal: str, table: str) -> None:
        import glob

        for part in sorted(glob.glob(os.path.join(self.outdir, f"{pascal}-part*.csv"))):
            if self.import_call_file_prefix != self.outdir:
                part = part.replace(self.outdir, self.import_call_file_prefix)
            self._copy_commands.add(
                f"\\copy {table} FROM '{part}' DELIMITER E'{self.delim}' CSV;"
            )

    def _write_node_headers(self) -> None:
        for label, props in self.node_property_dict.items():
            pascal = pascal_file_label(label)
            table = _psql_ident(pascal)
            columns = ["_ID VARCHAR"]
            for k, v in props.items():
                columns.append(f"{_psql_ident(k)} {_pg_type(v)}")
            columns.append("_LABEL VARCHAR[]")
            path = os.path.join(self.outdir, f"{table}-create_table.sql")
            with open(path, "w", encoding="utf-8") as fh:
                fh.write(self._ddl(table, columns))
            self._register_parts(pascal, table)
            if self.import_call_file_prefix != self.outdir:
                path = path.replace(self.outdir, self.import_call_file_prefix)
            self.import_call_nodes.add(path)

    def _write_edge_headers(self) -> None:
        for label, props in self.edge_property_dict.items():
            pascal = pascal_file_label(label)
            table = _psql_ident(pascal)
            columns = ["_START_ID VARCHAR", "_ID VARCHAR"]
            for k, v in props.items():
                if _psql_ident(k) == "_id":
                    raise ValueError("Column name '_ID' is reserved for the relationship id.")
                columns.append(f"{_psql_ident(k)} {_pg_type(v)}")
            columns += ["_END_ID VARCHAR", "_TYPE VARCHAR"]
            path = os.path.join(self.outdir, f"{table}-create_table.sql")
            with open(path, "w", encoding="utf-8") as fh:
                fh.write(self._ddl(table, columns))
            self._register_parts(pascal, table)
            if self.import_call_file_prefix != self.outdir:
                path = path.replace(self.outdir, self.import_call_file_prefix)
            self.import_call_edges.add(path)

    def get_import_call(self) -> str:
        call = ""
        for path in sorted([*self.import_call_nodes, *self.import_call_edges]):
            call += f'echo "Setup {path}..."\n'
            call += f"PGPASSWORD={self.db_password} "
            call += f"{self.import_call_bin_prefix}psql -f {path}"
            call += f" --dbname {self.db_name} --host {self.db_host}"
            call += f" --port {self.db_port} --user {self.db_user}"
            call += '\necho "Done!"\n\n'
        for cmd in sorted(self._copy_commands):
            part = cmd.split(" ")[3]
            call += f'echo "Importing {part}..."\n'
            call += f"PGPASSWORD={self.db_password} "
            call += f'{self.import_call_bin_prefix}psql -c "{cmd}"'
            call += f" --dbname {self.db_name} --host {self.db_host}"
            call += f" --port {self.db_port} --user {self.db_user}"
            call += '\necho "Done!"\n\n'
        return call


class SQLiteBatchWriter(PostgresBatchWriter):
    """S5: Postgres layout + a sqlite3 import script
    (reference _sqlite.py:4-53)."""

    def _import_script_name(self) -> str:
        return f"{self.db_name}-import-call.sh"

    def get_import_call(self) -> str:
        call = "#!/bin/bash\nset -e\n\n"
        for path in sorted([*self.import_call_nodes, *self.import_call_edges]):
            call += f'echo "Setup {path}..."\n'
            call += f"{self.import_call_bin_prefix}sqlite3 {self.db_name} < {path}"
            call += '\necho "Done!"\n\n'
        for cmd in sorted(self._copy_commands):
            table = cmd.split(" ")[1]
            part = cmd.split(" ")[3].replace("'", "")
            call += f'echo "Importing {part}..."\n'
            call += (
                f"{self.import_call_bin_prefix}sqlite3 -separator $'{self.delim}' "
                f'{self.db_name} ".import {part} {table}"'
            )
            call += '\necho "Done!"\n\n'
        return call
