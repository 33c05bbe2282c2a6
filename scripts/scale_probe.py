#!/usr/bin/env python3
"""Render the beyond-sf0.1 growth table from three QueryTime logs
(anchor = sf0.1, x10, x100 — see scripts/scale_probe.sh). Growth is
classed on WARM timings per decade; a query is flagged SUPER if its
x10->x100 ratio exceeds 14x (the BENCH_SCALES.md convention for a 10x
data step) AND its x100 warm time is slow enough to matter (>1 s —
sub-second totals are overhead-dominated, not growth signal).
"""
import re, sys

ROW = re.compile(r'^\[qtime\] (\S+)\s+cold=\s*([\d.]+)s warm=\s*([\d.]+)s '
                 r'rows=(\d+)')


def load(path):
    out = {}
    for line in open(path):
        m = ROW.match(line.strip())
        if m:
            out[m.group(1)] = (float(m.group(2)), float(m.group(3)),
                               int(m.group(4)))
    return out


def classify(w1, w10, w100):
    # Both decades are tested against the 14x/10x-step threshold, each
    # with its own absolute-time floor: a query that blows up on the
    # sf0.1->x10 decade but levels off afterwards (e.g. it hits a cap)
    # must still be flagged, and a still-sub-second x100 total must not
    # exempt first-decade growth that is already >1 s at x10.
    r1 = w10 / max(w1, 1e-9)
    r2 = w100 / max(w10, 1e-9)
    label = f'{r1:.1f}x/{r2:.1f}x'
    if (r2 > 14 and w100 > 1.0) or (r1 > 14 and w10 > 1.0):
        return label, 'SUPER'
    if w100 < 0.3:
        return label, 'flat'
    if r2 > 6:
        return label, 'linear'
    return label, 'sub-linear'


def main():
    anchor, x10, x100 = (load(p) for p in sys.argv[1:4])
    names = [n for n in anchor if n in x10 and n in x100]
    print('| query | warm sf0.1 s | warm x10 s | warm x100 s | '
          'sf0.1->x10 / x10->x100 | class |')
    print('|---|---|---|---|---|---|')
    supers = []
    for n in names:
        w1, w10, w100 = anchor[n][1], x10[n][1], x100[n][1]
        ratio, cls = classify(w1, w10, w100)
        if cls == 'SUPER':
            supers.append(n)
        print(f'| {n} | {w1:.2f} | {w10:.2f} | {w100:.2f} | {ratio} | {cls} |')
    missing = ({n for n in anchor} | set(x10) | set(x100)) - set(names)
    if missing:
        print(f'\nWARNING: {len(missing)} queries missing from some log: '
              f'{sorted(missing)}')
    # A blown-up corpus must never yield FEWER rows than the anchor —
    # collapse means the query silently read no/partial input (e.g. the
    # directory-layout stream-source bug this guard was added for).
    collapsed = [n for n in names
                 if anchor[n][2] > 0 and (x10[n][2] < anchor[n][2]
                                          or x100[n][2] < x10[n][2])]
    if collapsed:
        print(f'\nROW-COLLAPSE: {len(collapsed)} queries return fewer rows '
              f'at a larger scale — their timings above are NOT valid: '
              f'{collapsed}')
    print(f'\n{len(supers)} SUPER-linear of {len(names)} probed'
          + (f': {supers}' if supers else ''))


if __name__ == '__main__':
    main()
