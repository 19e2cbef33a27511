"""Render the checkpointed A/B campaign state (tools/ab_round2.py writes
CHATTERBOX_AB_STATE, default /tmp/r3/ab_state.json) as a markdown table for
docs/PERF.md.  Each pair ran (baseline, arm) back-to-back in one tunnel
window; rtt_before/rtt_after bracket each run so a score can be discounted
if the window moved under it.

Usage: python tools/ab_report.py [state.json]
"""
import json
import os
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "CHATTERBOX_AB_STATE", "/tmp/r3/ab_state.json")
    with open(path) as f:
        state = json.load(f)
    print("| pair | base tok/s | arm tok/s | arm/base | base TTFT p50 "
          "| arm TTFT p50 | RTT window (ms) |")
    print("|---|---|---|---|---|---|---|")
    for name, rec in state.items():
        b, a = rec["base"], rec["arm"]
        rtts = [b["rtt_before"], b["rtt_after"], a["rtt_before"],
                a["rtt_after"]]
        print(f"| {name} | {b['tok_s']:.0f} | {a['tok_s']:.0f} "
              f"| {a['tok_s'] / b['tok_s']:.3f}x "
              f"| {b['ttft_p50']:.2f}s | {a['ttft_p50']:.2f}s "
              f"| {min(rtts):.0f}–{max(rtts):.0f} |")


if __name__ == "__main__":
    main()
