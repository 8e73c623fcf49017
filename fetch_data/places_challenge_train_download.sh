#!/usr/bin/env bash
# Download + unpack the Places365 Challenge train_large split (a..z tar parts).
set -e

mkdir -p places_challenge_dataset
for letter in {a..z}; do
    echo "http://data.csail.mit.edu/places/places365/train_large_split/${letter}.tar"
done > places_challenge_dataset/places365_train.txt

cd places_challenge_dataset/
xargs -a places365_train.txt -n 1 -P 8 wget --continue
for tarball in *.tar; do
    tar xf "${tarball}"
done
