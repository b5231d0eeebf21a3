#!/usr/bin/env python3
"""Deterministic taxi CSV fixture generator (seed 42).

Produces src/test/resources/taxi_fixture.csv with the 19-column raw
schema from FIXTURES.md §1 — ~1k random-but-plausible rows plus
hand-built boundary rows exercising every filter edge in
Transformations.cleanAndTransform (duration exactly 1/180 min, speed
exactly 0/120, zero/negative amounts, out-of-box coordinates,
payment_type 7 with no lookup match, empty fields → nulls).

Committed output; rerun only to regenerate deliberately.
"""
import csv
import random
from datetime import datetime, timedelta

random.seed(42)
HEADER = (
    "VendorID,tpep_pickup_datetime,tpep_dropoff_datetime,passenger_count,"
    "trip_distance,pickup_longitude,pickup_latitude,RateCodeID,"
    "store_and_fwd_flag,dropoff_longitude,dropoff_latitude,payment_type,"
    "fare_amount,extra,mta_tax,tip_amount,tolls_amount,"
    "improvement_surcharge,total_amount"
).split(",")

BASE = datetime(2015, 1, 1, 0, 0, 0)


def fmt(ts):
    return ts.strftime("%Y-%m-%d %H:%M:%S")


def row(pickup, dur_min, dist, plon=-73.98, plat=40.75, dlon=-73.97,
        dlat=40.76, pay=1, fare=10.0, total=12.0, pc=1):
    drop = pickup + timedelta(seconds=int(dur_min * 60))
    return [
        2, fmt(pickup), fmt(drop), pc, round(dist, 2),
        round(plon, 6), round(plat, 6), 1, "N",
        round(dlon, 6), round(dlat, 6), pay,
        round(fare, 2), 0.5, 0.5, round(fare * 0.15, 2), 0.0, 0.3,
        round(total, 2),
    ]


rows = []
# ~1100 random plausible rows over 14 days
for i in range(1100):
    pickup = BASE + timedelta(minutes=random.randint(0, 14 * 24 * 60))
    dur = random.uniform(2, 120)
    dist = random.uniform(0.3, 25)
    fare = 2.5 + dist * 2.2 + dur * 0.35
    rows.append(row(
        pickup, dur, dist,
        plon=random.uniform(-74.02, -73.75), plat=random.uniform(40.6, 40.9),
        dlon=random.uniform(-74.02, -73.75), dlat=random.uniform(40.6, 40.9),
        pay=random.choice([1, 1, 1, 2, 2, 3, 4, 5, 6]),
        fare=fare, total=fare * 1.18, pc=random.randint(1, 6)))

b = BASE + timedelta(hours=9)
# boundary rows (comments give the filter edge exercised)
rows += [
    row(b, 1.0, 1.0),            # duration exactly 1 min  -> kept (inclusive)
    row(b, 180.0, 5.0),          # duration exactly 180    -> kept (inclusive)
    row(b, 0.5, 1.0),            # duration 0.5            -> dropped
    row(b, 181.0, 5.0),          # duration 181            -> dropped
    row(b, 30.0, 60.0),          # speed exactly 120 mph   -> kept (inclusive)
    row(b, 30.0, 61.0),          # speed 122               -> dropped
    row(b, 10.0, 0.0, fare=5.0), # distance 0              -> dropped
    row(b, 10.0, 2.0, fare=-5.0, total=-6.0),  # negative fare -> dropped
    row(b, 10.0, 2.0, fare=5.0, total=0.0),    # total 0       -> dropped
    row(b, 10.0, 2.0, pc=0),     # passenger_count 0       -> dropped
    row(b, 10.0, 2.0, plon=-75.0),  # lon exactly -75      -> dropped (strict)
    row(b, 10.0, 2.0, plon=-72.0),  # lon exactly -72      -> dropped (strict)
    row(b, 10.0, 2.0, plat=40.0),   # lat exactly 40       -> dropped (strict)
    row(b, 10.0, 2.0, dlat=42.0),   # lat exactly 42       -> dropped (strict)
    row(b, 10.0, 2.0, pay=7),    # unmatched payment code  -> null payment_desc
]
# a row with empty numeric fields (nulls after inference)
null_row = row(b, 15.0, 3.0)
null_row[3] = ""   # passenger_count null -> dropped by filter
rows.append(null_row)

with open("src/test/resources/taxi_fixture.csv", "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(HEADER)
    w.writerows(rows)
print(f"wrote {len(rows)} rows")
