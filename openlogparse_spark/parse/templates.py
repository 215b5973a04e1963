"""The 24-template message registry.

Mirrors the reference's 24 redo opcodes and their per-opcode field decoders
(ref: /root/reference/src/parser/Parser.cpp:282-460 opcode dispatch;
/root/reference/src/parser/OpCode*.h — 24 opcode headers).  Where the
reference dispatches on a binary ``opCode`` and walks fixed field offsets, we
dispatch on a *mined template* (Drain-style masked token sequence) and extract
parameters with anchored regexes ("grok").

Every parameter is rendered ``key=value`` with a single-token value, so the
masking rule ``key=value -> key=<*>`` (plus bare-digit-token masking) recovers
the template deterministically — the analogue of the reference's fixed opcode
table being knowable in advance.

The ``op`` field is the transaction-semantics class used by the aggregate
stage (ref: Transaction::flush classification,
/root/reference/src/parser/Transaction.cpp:179-551, and rollbackLastOp
inverse-op pairing, Transaction.cpp:54-177).
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Template:
    name: str
    op: str
    fmt: str                      # python format string used by the generator
    params: tuple[str, ...]       # named parameters, in order of appearance
    # role assigned by the generator for turns using this template
    gen_role: str = "assistant"
    _compiled: re.Pattern | None = field(default=None, compare=False)

    @property
    def masked(self) -> str:
        """The canonical masked template string (what mining recovers)."""
        out = re.sub(r"\{[a-z_]+\}", "<*>", self.fmt)
        return out

    @property
    def template_id(self) -> str:
        return template_id_of(self.masked)

    @property
    def regex(self) -> str:
        """Anchored grok regex with named capture groups."""
        pat = re.escape(self.fmt)
        for p in self.params:
            pat = pat.replace(re.escape("{%s}" % p), r"(?P<%s>\S+)" % p)
        return "^" + pat + "$"


def template_id_of(masked: str) -> str:
    """Stable template id: md5 prefix of the masked template string.

    Content-derived (not enumeration order) so ids are identical across runs,
    partition counts, and cluster sizes — the determinism requirement of
    SURVEY.md §7.3.
    """
    return hashlib.md5(masked.encode("utf-8")).hexdigest()[:12]


NOTE_SENTENCES = (
    "reviewing the previous output before continuing",
    "the plan looks good so far",
    "waiting for the long running job to finish",
    "user asked a clarifying question about scope",
    "summarizing findings for the final report",
    "switching strategy after repeated failures",
    "double checking the edge cases in the diff",
    "context compacted to stay within budget",
)

# 24 structured templates (+ NOTE sentence pool variants mined separately).
TEMPLATES: tuple[Template, ...] = (
    Template("begin", "begin", "BEGIN txn={xid} scope={scope}", ("xid", "scope")),
    Template("commit", "commit", "COMMIT txn={xid} rows={n}", ("xid", "n")),
    Template("rollback", "rollback", "ROLLBACK txn={xid}", ("xid",)),
    Template("rollback_last", "rollback_last", "ROLLBACK last op={opname}", ("opname",)),
    Template("call", "call", "CALL tool={tool} args={args}", ("tool", "args"), gen_role="assistant"),
    Template("result", "result", "RESULT tool={tool} rc={rc} bytes={n}", ("tool", "rc", "n"), gen_role="tool"),
    Template("error", "error", "ERROR code={code} msg={msg}", ("code", "msg"), gen_role="tool"),
    Template("insert", "insert", "INSERT obj={obj} rows={n}", ("obj", "n")),
    Template("update", "update", "UPDATE obj={obj} rows={n}", ("obj", "n")),
    Template("delete", "delete", "DELETE obj={obj} rows={n}", ("obj", "n")),
    Template("ddl", "ddl", "DDL stmt={ddltype} obj={obj} ret={ret}",
             ("ddltype", "obj", "ret")),
    Template("chkpt", "chkpt", "CHECKPOINT scn={scn} idx={i} at={at} lag={lag}",
             ("scn", "i", "at", "lag")),
    Template("read", "read", "READ file={path} bytes={n}", ("path", "n"), gen_role="tool"),
    Template("write", "write", "WRITE file={path} bytes={n}", ("path", "n"), gen_role="tool"),
    Template("fetch", "fetch", "FETCH url={url} status={status}", ("url", "status"), gen_role="tool"),
    Template("search", "search", "SEARCH query={q} hits={n}", ("q", "n"), gen_role="tool"),
    Template("grep", "grep", "GREP pattern={pat} matches={n}", ("pat", "n"), gen_role="tool"),
    Template("plan", "plan", "PLAN step={i} of={n} action={action}", ("i", "n", "action")),
    Template("think", "think", "THINK tokens={n}", ("n",)),
    Template("warn", "warn", "WARN code={code} retry={n}", ("code", "n"), gen_role="tool"),
    Template("metric", "metric", "METRIC name={name} value={v}", ("name", "v")),
    Template("session", "session", "SESSION start ua={ua} v={ver}", ("ua", "ver"), gen_role="system"),
    Template("close", "close", "SESSION end reason={reason} dur={n}", ("reason", "n")),
    Template("note", "note", "NOTE {sentence} id={n}", ("sentence", "n"), gen_role="user"),
)

BY_NAME: dict[str, Template] = {t.name: t for t in TEMPLATES}

# Typed decode table for k=v params — the analogue of the reference's
# per-column type dispatch (SysCol type ids /root/reference/src/common/table/
# SysCol.h:43-47 consumed by Builder::processValue switch,
# src/builder/Builder.cpp:89-615: NUMBER/DATE/TIMESTAMP/FLOAT/... -> typed
# emit). Keys are the k=v keys as they appear in message text; any key not
# listed stays string. Spark CAST of a non-conforming value yields NULL — the
# reference's unknown-value warn path (Builder.cpp:96-99), never an abort.
PARAM_TYPES: dict[str, str] = {
    "rows": "bigint",     # insert/update/delete/commit row counts
    "bytes": "bigint",    # result/read/write payload sizes
    "rc": "int",          # result return code
    "status": "int",      # fetch HTTP status
    "scn": "bigint",      # checkpoint sequence number
    "idx": "int",         # checkpoint index
    "hits": "bigint",     # search hit count
    "matches": "bigint",  # grep match count
    "step": "int",        # plan step
    "of": "int",          # plan total steps
    "tokens": "bigint",   # think token count
    "retry": "int",       # warn retry count
    "value": "double",    # metric value
    "dur": "bigint",      # session close duration (s)
    "id": "bigint",       # note id
    # DATE/TIMESTAMP decode parity (reference Builder.cpp:210-252 emits
    # typed time values, not strings): checkpoint wall-clock, ISO-8601 'T'
    # form — a single token, so masking/grok see it like any k=v value
    "at": "timestamp_ntz",
    # INTERVAL decode parity (reference Builder.cpp:354-589 INTERVAL_DTS /
    # INTERVAL_YTM typed emit, Format.h:47-54): checkpoint apply-lag as an
    # ANSI day-time interval — 'H:MM:SS' is the HOUR TO SECOND string form
    # both Spark CAST and DuckDB CAST(... AS INTERVAL) parse identically
    "lag": "interval hour to second",
    # the YEAR TO MONTH sibling (INTERVAL_YTM): ddl retention as ANSI 'Y-M'.
    # DuckDB cannot parse 'Y-M' strings, so its oracle recomputes months
    # arithmetically; Spark-side this is a real YearMonthIntervalType column.
    # CAUTION: PySpark 4.1.2's client-side YearMonthIntervalType.fromInternal
    # is NOT_IMPLEMENTED — .collect()/.show() of the raw column crashes.
    # Cast before collect: F.col("p.ret").cast("int") yields total months.
    "ret": "interval year to month",
}

# templates whose turns carry a non-null `tool` column
TOOL_TEMPLATES = frozenset({"call", "result"})

# DML ops subject to rollback-last cancellation
# (inverse-op table analogue: /root/reference/src/parser/Transaction.cpp:87-150)
DML_OPS = frozenset({"insert", "update", "delete"})


def all_masked_templates() -> list[tuple[str, str, str]]:
    """(template_id, masked_template, op) for every generatable template,
    expanding the NOTE sentence pool (each sentence is its own template the
    way Drain would mine it)."""
    rows: list[tuple[str, str, str]] = []
    for t in TEMPLATES:
        if t.name == "note":
            for s in NOTE_SENTENCES:
                masked = f"NOTE {s} id=<*>"
                rows.append((template_id_of(masked), masked, "note"))
        else:
            rows.append((t.template_id, t.masked, t.op))
    return rows
