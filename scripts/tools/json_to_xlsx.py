"""Flatten a nested metrics JSON ({exp: {key: {metric: value}}}) into one
table (reference ``scripts/tools/json_to_xlsx.py``).

The reference writes .xlsx via pandas; pandas is not in this image, so the
output is CSV (open in any spreadsheet) — same table.

    python scripts/tools/json_to_xlsx.py --json data/metrics_ablation.json
"""
from __future__ import annotations

import argparse
import csv
import json


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('--json', default='data/metrics_ablation.json')
    a = ap.parse_args()

    metrics = json.load(open(a.json))
    table: dict = {}
    for exp in metrics:
        for key in metrics[exp]:
            for met, val in metrics[exp][key].items():
                table.setdefault(f'{key}_{met}', {})[exp] = val

    out = a.json.rsplit('.json', 1)[0] + '.csv'
    exps = sorted({e for col in table.values() for e in col})
    cols = list(table)
    with open(out, 'w', newline='') as f:
        w = csv.writer(f)
        w.writerow([''] + cols)
        for e in exps:
            w.writerow([e] + [table[c].get(e, '') for c in cols])
    print(f'wrote {out}')


if __name__ == '__main__':
    main()
