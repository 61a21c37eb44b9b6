#!/usr/bin/env python3
"""Round-15 verdict ask 4: the declarative-class shared-function audit.

For every query GoldenCoverage classifies as `declarative` (engine
diversity is the anchor for the RELATIONAL composition), list every
shared hand-rolled helper its Spark-side implementation leans on, so
each helper can be checked against its own independent anchor. A
declarative row is only as trustworthy as the helpers under it: the
row's relational shape is cross-engine checked, but a shared helper
(tokenizer, scorer, iterative algorithm) is the same hand on both
sides and needs its own golden/property anchor.

Output: a markdown table (helper -> declarative rows leaning on it)
for SCALING.md, plus a raw per-query listing for eyeballing.
"""
import re
import sys
from pathlib import Path

SRC = Path("src/main/scala/graft")
QUERY_FILES = sorted((SRC / "queries").glob("*.scala"))

# Helper call patterns that denote shared hand-rolled code (object
# methods outside the query registry itself). Built-in
# org.apache.spark.sql.functions calls are declarative by definition
# and excluded; Tables.table is the corpus loader every query uses.
HELPER_RE = re.compile(
    r"\b(?:graft\.(?:ext|ops|read|stream|sources)\.)?"
    r"(TextAnalysis|Bpe|Dedup|NearDup|KCore|LabelProp|Hits|Sssp|Truss|"
    r"Similarity|IvfIndex|IvfPq|Pq|Sq8|Lloyd|Mmr|PrefixFilter|Skyline|"
    r"FreqAgg|TopKAgg|PrioritySample|Merge|Scd2|Skew|Multimodal|"
    r"Stats|Derive|Grids|Dashboard|ShardWriter|QualityClassifier)"
    r"\.([A-Za-z_][A-Za-z0-9_]*)")

# graft-native SQL functions registered by GraftExtensions — hand-rolled
# Catalyst expressions, each needs (and has) its own spec anchor.
NATIVE_RE = re.compile(
    r"call_function\(\s*\"([a-z0-9_]+)\"")

TRIVIAL = {
    # corpus loaders / plumbing, not algorithms
    ("Tables", "table"),
}


def extract_blocks(text):
    """Yield (name, body) for each QueryDef("name", ...) block, body
    spanning to the next QueryDef( or end of the `all` Seq."""
    starts = [(m.start(), m.group(1))
              for m in re.finditer(r"QueryDef\(\s*\n?\s*\"([a-z0-9_]+)\"", text)]
    for i, (pos, name) in enumerate(starts):
        end = starts[i + 1][0] if i + 1 < len(starts) else len(text)
        yield name, text[pos:end]


def main():
    declarative = set()
    cov = (SRC / "GoldenCoverage.scala").read_text()
    decl_block = cov.split("val declarative: Set[String] = Set(")[1]
    decl_block = decl_block.split("  )")[0]
    declarative.update(re.findall(r"\"([a-z0-9_]+)\"", decl_block))

    per_query = {}
    for f in QUERY_FILES:
        text = f.read_text()
        for name, body in extract_blocks(text):
            if name not in declarative:
                continue
            helpers = set()
            for m in HELPER_RE.finditer(body):
                obj, meth = m.group(1), m.group(2)
                if (obj, meth) in TRIVIAL:
                    continue
                helpers.add(f"{obj}.{meth}")
            for m in NATIVE_RE.finditer(body):
                helpers.add(f"native:{m.group(1)}")
            per_query[name] = sorted(helpers)

    missing = declarative - set(per_query)
    if missing:
        print(f"WARNING: {len(missing)} declarative rows not found in "
              f"registry sources: {sorted(missing)}", file=sys.stderr)

    by_helper = {}
    for q, hs in per_query.items():
        for h in hs:
            by_helper.setdefault(h, []).append(q)

    pure = sorted(q for q, hs in per_query.items() if not hs)
    print(f"# declarative rows: {len(per_query)}; "
          f"pure built-ins (no shared helper): {len(pure)}")
    print()
    print("| shared helper | declarative rows leaning on it |")
    print("|---|---|")
    for h in sorted(by_helper):
        qs = sorted(by_helper[h])
        print(f"| `{h}` | {', '.join(qs)} |")
    print()
    print("## per-query (rows with helpers)")
    for q in sorted(per_query):
        if per_query[q]:
            print(f"- {q}: {', '.join(per_query[q])}")
    print()
    print("## pure built-in rows")
    print(", ".join(pure))


if __name__ == "__main__":
    main()
