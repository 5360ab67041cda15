#!/bin/bash
# Fetch the bigann (SIFT) dataset used by the canonical benchmarks.
# Twin of the reference's SIFT-download.sh (/root/reference/SIFT-download.sh):
# bigann base/query/ground-truth from the irisa texmex corpus (~92 GB
# compressed, ~230 GB extracted). Run on a machine with network egress;
# this build environment has none, so synthetic clustered data
# (scripts/e2e_65k.py, bench.py synth_raw) stands in for quality runs.
set -euo pipefail

OUTPUT_DIR="${1:-./SIFT-dataset}"
BASE_URL="ftp://ftp.irisa.fr/local/texmex/corpus"

mkdir -p "$OUTPUT_DIR"

for f in bigann_query.bvecs.gz bigann_gnd.tar.gz bigann_base.bvecs.gz; do
  if [ ! -e "$OUTPUT_DIR/${f%.gz}" ] && [ ! -e "$OUTPUT_DIR/$f" ]; then
    echo "Downloading $f ..."
    wget -P "$OUTPUT_DIR" "$BASE_URL/$f"
  fi
done

echo "Extracting (needs ~230 GB free)..."
gunzip -kv "$OUTPUT_DIR"/bigann_base.bvecs.gz
gunzip -kv "$OUTPUT_DIR"/bigann_query.bvecs.gz
tar -xf "$OUTPUT_DIR"/bigann_gnd.tar.gz -C "$OUTPUT_DIR"

echo "Done. Point --input/--query/--gnd at $OUTPUT_DIR (loaders read bvecs/ivecs directly)."
