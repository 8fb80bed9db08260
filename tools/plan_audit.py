#!/usr/bin/env python3
"""Full-surface physical-plan audit over a `graft.Explain` dump (NOT
part of the library; the recipe docs/PLANS.md's headline cites).

Rules, encoded explicitly so the headline claim is reproducible:

- CartesianProduct: never allowed (0 expected).
- Exchange SinglePartition: allowed ONLY when it is the final stage of
  a GLOBAL aggregate — the exchange moves one pre-aggregated row per
  upstream partition (partition-count-sized, not data-sized), which is
  correct and unavoidable for a global sum/count/max; the classifier
  requires a `Keys: []` aggregate detail block both immediately above
  (the partial) and below (the final) the exchange's detail block.
- Per-query exemptions, each with a written reason, for plans whose
  single-partition stage is the DOCUMENTED POINT of the query.

Anything else is a residual scale-killer and fails the audit (exit 1).

Usage: python3 tools/plan_audit.py [dumpfile=docs/PLANS.md]
"""
import re
import sys

# plans whose single-partition stage is deliberate:
# name -> (max exhibit exchanges, operator SIGNATURE, reason). Both
# the cap AND the signature are load-bearing (r10/r11 ADVICE): an
# open-ended exemption would wave through a future unrelated
# single-partition exchange in the same query, and a purely
# positional cap could transfer the blessing to a NEW exchange if the
# documented wart moved — the exemption only applies when the
# signature appears in the 12 lines after the exchange (the
# documented wart's own operator), so anything else stays a residual.
EXEMPT = {
    "q_sql_gold_user_rfm_segments": (1, "ntile(5)",
        "the E2 parity WART EXHIBIT: the reference RFM model's literal "
        "partition-less NTILE runs as text to demonstrate the "
        "single-partition window MIGRATION.md documents; the engine "
        "path (gold_user_rfm_segments via GlobalRank) has none"),
    "q_ewma_daily_revenue": (1, "collect_list(revenue",
        "single-task sequential EWMA fold over the GLOBAL daily-revenue "
        "panel — one row per calendar date after the upstream aggregate "
        "(calendar-bounded at any corpus scale); the scaladoc's grain "
        "contract points unbounded/per-entity series to the distributed "
        "EwmaScan path (q_ewma_scan_report gates their agreement)"),
}

# fail-open guard (r10 ADVICE): a dump that parses to zero sections —
# wrong file, truncated, reformatted — must be a loud failure, not a
# "0 residual" pass. The full surface has 154 queries; the floor only
# needs to catch catastrophic parse failure, not pin the exact count.
MIN_QUERIES = 100


def audit(path):
    text = open(path, encoding="utf-8").read()
    # split into per-query sections
    parts = re.split(r"=+ (\w+) =+", text)
    sections = {parts[i]: parts[i + 1] for i in range(1, len(parts) - 1, 2)}
    if len(sections) < MIN_QUERIES:
        print(f"AUDIT INVALID: only {len(sections)} query sections parsed "
              f"from {path} (expected >= {MIN_QUERIES}) — wrong, truncated "
              "or reformatted dump; refusing to report a clean surface")
        return 1
    cartesian = {}
    whitelisted = exhibits = 0
    residual = []
    for name, body in sections.items():
        nc = body.count("CartesianProduct")
        if nc:
            cartesian[name] = nc
        lines = body.splitlines()
        seen_exempt = 0
        for i, ln in enumerate(lines):
            if "Arguments: SinglePartition" not in ln:
                continue
            after = lines[i:i + 12]
            if (name in EXEMPT and seen_exempt < EXEMPT[name][0]
                    and any(EXEMPT[name][1] in a for a in after)):
                seen_exempt += 1
                exhibits += 1
                continue
            window = lines[max(0, i - 12):i]
            is_global_agg_final = (
                any("Keys: []" in w for w in window)
                and any("Keys: []" in a for a in after))
            if is_global_agg_final:
                whitelisted += 1
            else:
                residual.append((name, i, ln.strip()))
    print(f"queries audited:           {len(sections)}")
    print(f"CartesianProduct:          {sum(cartesian.values())} "
          f"{sorted(cartesian) if cartesian else ''}")
    print(f"SinglePartition exchanges: "
          f"{whitelisted + exhibits + len(residual)} total")
    print(f"  global-agg-final (whitelisted by rule): {whitelisted}")
    print(f"  documented exhibits ({len(EXEMPT)} plans):"
          f"          {exhibits}")
    for q, (cap, sig, reason) in sorted(EXEMPT.items()):
        print(f"    - {q} (max {cap}, signature {sig!r}): {reason}")
    print(f"  RESIDUAL (scale-killers):               {len(residual)}")
    for name, i, ln in residual:
        print(f"    ! {name} @section-line {i}: {ln}")
    return 1 if (residual or cartesian) else 0


if __name__ == "__main__":
    sys.exit(audit(sys.argv[1] if len(sys.argv) > 1 else "docs/PLANS.md"))
