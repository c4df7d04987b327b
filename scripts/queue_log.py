#!/usr/bin/env python
"""Validated appender for the chip-queue JSONL mirrors.

Round 4's queue scripts piped `grep '^{'` into the results file, which wrote
an unparseable truncated row when a result JSON spanned lines
(`docs/CHIP_QUEUE_r04.jsonl` `profile_egomcq16`). This reads the harness
stdout, extracts every syntactically complete top-level JSON object (multi-
line included), wraps it as {"experiment": tag, "result": obj}, and appends
one `json.dumps` line per object — every appended line is json.loads-able by
construction.

Usage: python scripts/queue_log.py <results.jsonl> <tag> [stdout_file]
       (reads stdin when stdout_file is omitted; exits 0 even when no JSON
       was found, appending an {"experiment": tag, "result": {"no_json":
       true, "tail": ...}} marker so dropped results are visible)
"""
import json
import sys


def extract_objects(text: str):
    """Every top-level {...} object in `text` that json.loads accepts."""
    dec = json.JSONDecoder()
    out = []
    i = 0
    while True:
        j = text.find("{", i)
        if j < 0:
            break
        try:
            obj, end = dec.raw_decode(text[j:])
        except ValueError:
            i = j + 1
            continue
        if isinstance(obj, dict):
            out.append(obj)
            i = j + end
        else:
            i = j + 1
    return out


def main():
    results, tag = sys.argv[1], sys.argv[2]
    if len(sys.argv) > 3:
        with open(sys.argv[3], "r", errors="replace") as f:
            text = f.read()
    else:
        text = sys.stdin.read()
    objs = extract_objects(text)
    if not objs:
        objs = [{"no_json": True, "tail": text[-400:]}]
    with open(results, "a") as f:
        for obj in objs:
            line = json.dumps({"experiment": tag, "result": obj})
            json.loads(line)  # guaranteed, but keep the invariant explicit
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
