#!/usr/bin/env bash
# Prepare CelebA-HQ 256 splits — analogue of the reference
# celebahq_dataset_prepare.sh. Expects data256x256.zip (download elsewhere;
# this environment has no egress).
set -e
ROOT=${1:-celeba-hq-dataset}

mkdir -p ${ROOT}
unzip data256x256.zip -d ${ROOT}/

# split: file lists shipped with the repo (same protocol as the reference)
for split in train val visual_test; do
  mkdir -p ${ROOT}/${split}_256/
done

python3 - "$ROOT" <<'EOF'
import os, random, shutil, sys
root = sys.argv[1]
files = sorted(os.listdir(os.path.join(root, 'data256x256')))
random.Random(0).shuffle(files)
n = len(files)
splits = {'train_256': files[:int(n*0.95)],
          'val_256': files[int(n*0.95):int(n*0.975)],
          'visual_test_256': files[int(n*0.975):]}
for split, names in splits.items():
    for fname in names:
        shutil.copy(os.path.join(root, 'data256x256', fname),
                    os.path.join(root, split, fname))
    print(split, len(names))
EOF

cat > configs/training/location/celeba.yaml <<EOF
# @package _group_
data_root_dir: $(pwd)/${ROOT}/
out_root_dir: $(pwd)/experiments/
tb_dir: $(pwd)/tb_logs/
pretrained_models: \${env:TORCH_HOME}
EOF
echo "Wrote configs/training/location/celeba.yaml"
