#!/usr/bin/env python3
"""Render BENCH_SCALES.md from three full-precision Bench lines
(sf0.001, sf0.01, sf0.1 — 1x / 10x / 100x data).

Growth classing uses the sf0.01 -> sf0.1 ratio (10x data), the pair
where real work dominates JVM/session overhead:
  flat        t(0.1) < 0.3 s             — overhead-bound at every sf;
                                           growth unmeasurable and moot
  sub-linear  ratio <  6                  — fixed costs still amortizing
  linear      6 <= ratio <= 14            — tracking data volume
  SUPER       ratio > 14                  — flagged: grows faster than
                                           data; scale risk
The sf0.001 column is evidence against empty-input/single-partition
pathologies, not a growth signal.
"""
import json, sys


def load(p):
    with open(p) as f:
        d = json.loads(f.readline())
    return d


def fam(q):
    return q.split('_')[0].rstrip('0123456789')


def main(paths):
    a, b, c = (load(p) for p in paths)
    for d, n in ((a, 'sf0.001'), (b, 'sf0.01'), (c, 'sf0.1')):
        assert d['sf'] == n, f"expected {n}, got {d['sf']}"
        assert d.get('failed', 0) == 0, f"{n} had failures: {d}"
    qs = sorted(c['queries'])
    assert set(qs) == set(a['queries']) == set(b['queries'])
    fixture = set(c.get('fixture_backed', []))

    lines = ['# BENCH_SCALES — per-query growth across sf0.001 / '
             'sf0.01 / sf0.1',
             '',
             f"Totals: {a['value']:.2f} s / {b['value']:.2f} s / "
             f"{c['value']:.2f} s ({len(qs)} queries, failed 0/0/0; "
             'steady-state timings after a full untimed pre-pass; '
             'regenerate with `scripts/bench_scales.sh`).',
             '',
             'Growth class keys on t(sf0.01)->t(sf0.1), a 10x data '
             'step: flat = t(sf0.1) < 0.3 s (overhead-bound); '
             'sub-linear < 6x; linear 6-14x; SUPER > 14x (flagged). '
             '`*` = steady-state reads a pay-once persisted fixture '
             '(see Bench.scala scaladoc).',
             '',
             '| query | t(0.001) s | t(0.01) s | t(0.1) s | 10x ratio '
             '| class |',
             '|---|---|---|---|---|---|']
    per_family = {}
    supers = []
    for q in qs:
        ta, tb, tc = a['queries'][q], b['queries'][q], c['queries'][q]
        ratio = tc / tb if tb > 0 else float('inf')
        if tc < 0.3:
            cls = 'flat'
        elif ratio < 6:
            cls = 'sub-linear'
        elif ratio <= 14:
            cls = 'linear'
        else:
            cls = 'SUPER'
            supers.append(q)
        star = '\\*' if q in fixture else ''
        lines.append(f'| {q}{star} | {ta:.3f} | {tb:.3f} | {tc:.3f} | '
                     f'{ratio:.1f}x | {cls} |')
        per_family.setdefault(fam(q), []).append((q, tc, ratio, cls))

    lines += ['', '## Per-family verdict', '']
    for f in sorted(per_family):
        rows = per_family[f]
        worst = max(rows, key=lambda r: r[2] if r[3] != 'flat' else 0)
        n_flat = sum(1 for r in rows if r[3] == 'flat')
        n_sup = sum(1 for r in rows if r[3] == 'SUPER')
        verdict = ('SCALE RISK' if n_sup else 'scales')
        lines.append(
            f'- **{f}** ({len(rows)} queries): {verdict} — worst '
            f'measurable growth {worst[2]:.1f}x on `{worst[0]}` '
            f'(t(0.1)={worst[1]:.2f} s); {n_flat} overhead-bound.')
    lines += ['',
              ('## Flagged queries: ' + ', '.join(supers)) if supers
              else '## Flagged queries: none — no query grows '
                   'super-linearly in sf across the measured decade.']
    out = '\n'.join(lines) + '\n'
    # Preserve the hand-written narrative below the generated block
    # (blow-up decades, round updates): everything from the first
    # "## Beyond sf0.1" heading on survives a regeneration. The r11
    # regeneration silently dropped ~480 such lines — never again.
    try:
        old = open('BENCH_SCALES.md').read()
    except FileNotFoundError:
        old = None  # first generation: nothing to preserve
    if old is not None:
        try:
            i = min(j for m in ('## Bench protocol', '## Beyond sf0.1')
                    if (j := old.find(m)) >= 0)
            out += '\n' + old[i:]
        except ValueError:
            # The file exists but neither marker heading was found —
            # regenerating now would silently drop the whole narrative
            # (the exact r11 incident). Fail instead of discarding.
            sys.exit('BENCH_SCALES.md exists but has no narrative marker '
                     "('## Bench protocol' / '## Beyond sf0.1') — refusing "
                     'to regenerate over it; restore or rename the heading.')
    with open('BENCH_SCALES.md', 'w') as f:
        f.write(out)
    print(out)


if __name__ == '__main__':
    main(sys.argv[1:4])
