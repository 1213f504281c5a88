"""ETL file config headers.

Reference grammar (easy_sql/config/sql_config.py:19-39, 104-230)::

    -- backend: spark
    -- config: easy_sql.etl_type=batch
    -- config: spark.sql.shuffle.partitions=16
    -- inputs: db.tbl_a, db.tbl_b
    -- outputs: db.out
    -- prepare-sql: create database if not exists sample

Engine-prefixed config keys become session conf; ``easy_sql.*`` keys
configure the processor itself.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# the reference's header patterns require the literal "-- " prefix (one
# space) and no space before the colon (sql_config.py:24,38,131) —
# "--backend: x" / "-- backend : x" are plain comments there, and a
# reference ETL may rely on that to DISABLE a header, so we must not
# activate them (differential-fuzzed parity, same class as -- target)
HEADER_RE = re.compile(
    r"^-- \s*(backend|config|inputs|outputs|prepare-sql|owner|schedule):\s*(.*)$"
)


@dataclass
class EtlConfig:
    backend: str = "spark"
    etl_type: str = "batch"  # batch | streaming
    engine_conf: dict[str, str] = field(default_factory=dict)
    easy_sql_conf: dict[str, str] = field(default_factory=dict)
    inputs: list[str] = field(default_factory=list)
    outputs: list[str] = field(default_factory=list)
    prepare_sql: list[str] = field(default_factory=list)
    udf_file_path: str | None = None
    func_file_path: str | None = None
    scala_udf_initializer: str | None = None
    skip_duplicate_include: bool = False
    # set by the CLI / test_run_etl when the ETL came from a file; lets
    # funcs resolve sibling ETL paths (reference EasySqlConfig.abs_sql_file_path)
    abs_sql_file_path: str | None = None

    @classmethod
    def parse(cls, sql: str) -> "EtlConfig":
        cfg = cls()
        backend_seen = False
        for line in sql.split("\n"):
            # UNSTRIPPED: an indented header is a plain comment in the
            # reference (its patterns anchor at column 0)
            m = HEADER_RE.match(line)
            if not m:
                continue
            key, value = m.group(1), m.group(2).strip()
            if key == "backend":
                # FIRST backend line wins (reference parse_backend
                # breaks on the first match), first space-token only
                # ("spark cluster-extras" selects "spark")
                if not backend_seen:
                    cfg.backend = value.split(" ")[0]
                    backend_seen = True
            elif key == "prepare-sql":
                cfg.prepare_sql.append(value)
            elif key == "inputs":
                cfg.inputs.extend(t.strip() for t in value.split(",") if t.strip())
            elif key == "outputs":
                cfg.outputs.extend(t.strip() for t in value.split(",") if t.strip())
            elif key == "config":
                if "=" not in value:
                    continue
                k, v = value.split("=", 1)
                k, v = k.strip(), v.strip()
                if k.startswith("easy_sql."):
                    short = k[len("easy_sql.") :]
                    cfg.easy_sql_conf[short] = v
                    if short == "etl_type":
                        cfg.etl_type = v
                    elif short == "udf_file_path":
                        cfg.udf_file_path = v
                    elif short == "func_file_path":
                        cfg.func_file_path = v
                    elif short == "scala_udf_initializer":
                        cfg.scala_udf_initializer = v
                    elif short == "skip_duplicate_include":
                        # reference truthy set: "1"/"true" (lowered)
                        cfg.skip_duplicate_include = v.lower() in (
                            "1",
                            "true",
                        )
                else:
                    cfg.engine_conf[k] = v
        return cfg
