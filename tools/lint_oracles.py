"""Oracle-convention linter (VERDICT r8 #7): grep-enforces the CLAUDE.md
rules whose violations keep recurring as intermittent gate mismatches.
Run in the closing ritual; exit 1 on any finding.

Rules:
  R1  money-sum drift — `ROUND(SUM(` over raw doubles in oracle SQL
      (queries/*.py string constants). Sanctioned forms: the cents grid
      `SUM(CAST(ROUND(x*100) AS BIGINT))` and the avg_stable inner-mean
      `ROUND(ROUND(SUM(x),2)/COUNT...)`.
  R2  decimal-literal leak — bare `1.0`-style literals inside shared
      expression strings (`*_EXPR` assignments and `F.expr("...")`
      literal args): Spark SQL parses them as DECIMAL and the type leaks
      into outputs (driver-canon hazard). Use scientific (`1e0`, `2.5e0`).
  R3  truncate-vs-round divergence — `CAST(<expr with /> AS BIGINT)` in
      oracle SQL: DuckDB's CAST(double AS BIGINT) ROUNDS while Spark's
      cast truncates; use `//` (DuckDB) / `div` (Spark) for exact integer
      division.
  R4  same-lineage crossJoin ambiguity — `x.crossJoin(... x ...)` with no
      `.alias(` in the statement: unqualified refs on the joined frame are
      analysis-time AMBIGUOUS (persist does not fix it).

A line ending in `# lint: ok <reason>` (Python) or containing
`-- lint: ok` (SQL) is exempt.
"""

from __future__ import annotations

import ast
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "azure_medicine_data_engineering_spark"

EXEMPT = re.compile(r"(#|--) lint: ok")

#: R2: a decimal literal like 1.0 / 0.05 — but NOT 1e0 / 2.5e0 / 0.5e0
#: (scientific), not part of an identifier/number like sf0.01 or v1.0.0.
DEC_LIT = re.compile(r"(?<![\w.])\d+\.\d+(?![\d.]*e)(?![\w.])", re.IGNORECASE)


def _string_constants(tree: ast.AST) -> list[tuple[int, str, str]]:
    """(lineno, context, text) for strings we lint: *_EXPR assignments,
    F.expr(...) args, and oracle SQL (any string containing SELECT/ROUND/
    SUM keywords inside queries/ modules is handled by the caller)."""
    out = []

    def _texts(node: ast.AST) -> list[tuple[int, str]]:
        """String constants under node; f-strings reassemble into one text
        with `{}` placeholders so context (e.g. a percentile( prefix)
        survives."""
        res = []
        for c in ast.walk(node):
            if isinstance(c, ast.JoinedStr):
                joined = "".join(
                    v.value if isinstance(v, ast.Constant) else "{}"
                    for v in c.values
                )
                res.append((c.lineno, joined))
        covered = {
            id(v)
            for c in ast.walk(node)
            if isinstance(c, ast.JoinedStr)
            for v in c.values
        }
        for c in ast.walk(node):
            if (
                isinstance(c, ast.Constant)
                and isinstance(c.value, str)
                and id(c) not in covered
            ):
                res.append((c.lineno, c.value))
        return res

    class V(ast.NodeVisitor):
        def visit_Assign(self, node: ast.Assign):
            names = [t.id for t in node.targets if isinstance(t, ast.Name)]
            if any(n.endswith("_EXPR") for n in names):
                for lineno, text in _texts(node.value):
                    out.append((lineno, f"{names[0]} =", text))
            self.generic_visit(node)

        def visit_Call(self, node: ast.Call):
            fn = node.func
            if (
                isinstance(fn, ast.Attribute)
                and fn.attr == "expr"
                and isinstance(fn.value, ast.Name)
                and fn.value.id == "F"
            ):
                for a in node.args:
                    for lineno, text in _texts(a):
                        out.append((lineno, "F.expr(", text))
            self.generic_visit(node)

    V().visit(tree)
    return out


def _sql_constants(tree: ast.AST) -> list[tuple[int, str]]:
    """All string constants that look like SQL (for R1/R3 in queries/)."""
    out = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            s = node.value
            if re.search(r"\bSELECT\b|\bFROM\b|\bSUM\s*\(", s, re.IGNORECASE):
                out.append((node.lineno, s))
    return out


def _strip_exempt_sql(sql: str) -> str:
    return "\n".join(l for l in sql.splitlines() if not EXEMPT.search(l))


def lint() -> list[str]:
    findings: list[str] = []

    py_files = sorted(PKG.rglob("*.py"))
    for path in py_files:
        src = path.read_text()
        rel = path.relative_to(REPO)
        try:
            tree = ast.parse(src)
        except SyntaxError as e:  # pragma: no cover
            findings.append(f"{rel}: unparseable ({e})")
            continue
        src_lines = src.splitlines()

        # R2 on shared expression strings everywhere
        for lineno, ctx, text in _string_constants(tree):
            if lineno <= len(src_lines) and EXEMPT.search(src_lines[lineno - 1]):
                continue
            for m in DEC_LIT.finditer(text):
                # percentile fraction args are sanctioned: the function's
                # result type is double regardless of the literal's type
                if re.search(
                    r"percentile(_approx)?\s*\(",
                    text[: m.start()],
                    re.IGNORECASE,
                ):
                    continue
                findings.append(
                    f"{rel}:{lineno} R2 decimal literal `{m.group(0)}` in "
                    f"shared expression ({ctx}...) — use scientific (e.g. "
                    f"{m.group(0)}e0)"
                )

        # R1 + R3 on oracle SQL in queries/
        if "queries" in path.parts:
            for lineno, sql in _sql_constants(tree):
                body = _strip_exempt_sql(sql)
                for m in re.finditer(r"ROUND\s*\(\s*SUM\s*\(", body, re.IGNORECASE):
                    tail = body[m.end() : m.end() + 40]
                    head = body[max(0, m.start() - 12) : m.start()]
                    if re.match(r"\s*CAST\s*\(\s*ROUND", tail, re.IGNORECASE):
                        continue  # cents grid
                    if re.search(r"ROUND\s*\(\s*$", head, re.IGNORECASE):
                        continue  # avg_stable inner-mean ROUND(ROUND(SUM
                    findings.append(
                        f"{rel}:{lineno} R1 raw `ROUND(SUM(` over doubles in "
                        f"oracle SQL — sum on the integer grid "
                        f"(SUM(CAST(ROUND(x*100) AS BIGINT))/100)"
                    )
                for m in re.finditer(
                    r"CAST\s*\(\s*(\w+)?\s*\(?([^()]|\([^()]*\))*?AS\s+BIGINT\s*\)",
                    body,
                    re.IGNORECASE,
                ):
                    inner = m.group(0)
                    # ROUND/FLOOR/CEIL snap the double to an integer first:
                    # the cast is then exact on both engines (below 2^53)
                    if re.match(
                        r"CAST\s*\(\s*(ROUND|FLOOR|CEIL|CEILING)\s*\(",
                        inner,
                        re.IGNORECASE,
                    ):
                        continue
                    if re.search(r"(?<!/)/(?!/)", inner):
                        findings.append(
                            f"{rel}:{lineno} R3 `CAST(.../ ... AS BIGINT)` in "
                            f"oracle SQL — DuckDB rounds, Spark truncates; "
                            f"use `//`"
                        )

        # R4: same-lineage crossJoin without aliases (textual heuristic)
        for i, line in enumerate(src_lines, 1):
            if EXEMPT.search(line):
                continue
            m = re.search(r"(\w+)\.crossJoin\(", line)
            if not m:
                continue
            var = m.group(1)
            stmt = line
            # pull the (possibly multi-line) argument for context
            j = i
            while stmt.count("(") > stmt.count(")") and j < len(src_lines):
                stmt += src_lines[j]
                j += 1
            arg = stmt.split(".crossJoin(", 1)[1]
            if re.search(rf"\b{re.escape(var)}\b", arg) and ".alias(" not in stmt:
                findings.append(
                    f"{rel}:{i} R4 same-lineage crossJoin on `{var}` without "
                    f".alias() — unqualified refs are analysis-time ambiguous"
                )

    return findings


def main() -> int:
    findings = lint()
    for f in findings:
        print(f)
    print(f"{len(findings)} finding(s)")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
