#!/usr/bin/env python3
"""Find each run's best checkpoint by the monitor metric — analogue of
reference bin/paper_runfiles/find_best_checkpoint.py (which greps train.log);
ours reads the structured models/index.json written by the trainer."""
import argparse
import json
import os


def find_best_checkpoint(model_list, models_dir):
    with open(model_list) as f:
        models = [m.strip() for m in f if m.strip()]
    with open(f'{model_list}_best', 'w') as out:
        for model in models:
            index_path = os.path.join(models_dir, model, 'models', 'index.json')
            if not os.path.exists(index_path):
                print(f'{model}: no index.json, skipping')
                continue
            with open(index_path) as fi:
                records = json.load(fi)
            best = max(records, key=lambda r: r['value'])
            print(f"{model}: epoch {best['epoch']} value {best['value']:.4f}")
            out.write(f"{model}\t{best['epoch']}\t{best['name']}\t{best['value']}\n")


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('model_list', help='file with run dir names, one per line')
    parser.add_argument('models_dir', help='root containing the run dirs')
    args = parser.parse_args()
    find_best_checkpoint(args.model_list, args.models_dir)
