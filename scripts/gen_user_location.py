#!/usr/bin/env python3
"""Generate data/user_location.ndjson — the messy user→location NDJSON
dimension for q27_ndjson_dim, mirroring the reference's
wallet_location2.ndjson pathologies (null locations, '?', comma-lists,
a junk 'Unnamed: 2' column on some rows). Deterministic: safe to re-run.

Covers user_ids 0..149 (all of sf0.01's events.user_id domain) plus a
few ids absent from the fact table (dropped by the inner join).
"""
import json, os

LOCATIONS = ["US", "DE", "FR", "JP", "BR", "?", "US, CA", None, "GB", "IN"]

out = os.path.join(os.path.dirname(__file__), "..", "data", "user_location.ndjson")
os.makedirs(os.path.dirname(out), exist_ok=True)
with open(out, "w") as f:
    for uid in range(150):
        row = {"user_id": uid, "location": LOCATIONS[(uid * 7) % len(LOCATIONS)]}
        if uid % 37 == 3:  # the reference's stray spreadsheet-export column
            row["Unnamed: 2"] = "junk"
        f.write(json.dumps(row) + "\n")
    for uid in (9000, 9001):  # ids with no fact rows
        f.write(json.dumps({"user_id": uid, "location": "AQ"}) + "\n")
print(f"wrote {out}")
