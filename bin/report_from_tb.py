#!/usr/bin/env python3
"""Regroup TensorBoard event files into per-split runs — analogue of
reference bin/report_from_tb.py (train/val/test/extra_val dashboards)."""
import argparse
import glob
import os
import re

GROUPING_RULES = [
    re.compile(r'^(?P<group>train|test|val|extra_val_.*?(256|512))_(?P<title>.*)', re.I),
    re.compile(r'^(?P<group>train|test|val)/(?P<title>.*)', re.I),
]
DROP_RULES = [re.compile(r'_std$', re.I)]


def need_drop(tag):
    return any(rule.search(tag) for rule in DROP_RULES)


def get_group_and_title(tag):
    for rule in GROUPING_RULES:
        match = rule.search(tag)
        if match is not None:
            return match.group('group'), match.group('title')
    return None, None


def main(args):
    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator
    from tensorboardX import SummaryWriter

    os.makedirs(args.outdir, exist_ok=True)
    ignored = set()

    for orig_fname in glob.glob(args.inglob):
        cur_dirpath = os.path.dirname(orig_fname)
        subdirname = os.path.basename(cur_dirpath)
        exp_name = os.path.basename(os.path.dirname(cur_dirpath))

        acc = EventAccumulator(orig_fname)
        acc.Reload()
        writers_by_group = {}
        for tag in acc.Tags().get('scalars', []):
            if need_drop(tag):
                continue
            group, title = get_group_and_title(tag)
            if group is None:
                if tag not in ignored:
                    print(f'WARNING: could not detect group for {tag}, ignoring')
                    ignored.add(tag)
                continue
            writer = writers_by_group.get(group)
            if writer is None:
                outdir = os.path.join(args.outdir, exp_name,
                                      f'{subdirname}_{group}' if args.include_version
                                      else group)
                writer = SummaryWriter(outdir)
                writers_by_group[group] = writer
            for event in acc.Scalars(tag):
                writer.add_scalar(title, event.value, global_step=event.step,
                                  walltime=event.wall_time)
        for w in writers_by_group.values():
            w.close()


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('inglob', help='glob over tb event files')
    parser.add_argument('outdir')
    parser.add_argument('--include-version', action='store_true')
    main(parser.parse_args())
