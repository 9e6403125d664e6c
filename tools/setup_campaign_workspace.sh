#!/bin/bash
# Regenerate the accuracy-campaign workspace from scratch (idempotent).
# The workspace lives OUTSIDE the repo and does not survive environment
# resets. The corpus (wavs + transcripts) is derived bit-exactly from
# seed 17; the CMVN stats and vocabulary are then synced FROM the
# committed dataset/ snapshot so the workspace always matches the
# committed trained checkpoint's baked-in GlobalCMVN (the committed
# stats predate seeded CMVN sampling, so a recompute would differ
# slightly; see docs/accuracy_campaign.md "Corpus").
#
# Usage: tools/setup_campaign_workspace.sh [workdir]   (default /root/work)
#
# Produces, under <workdir>:
#   dataset_src/            30 h synthetic corpus (wavs + annotation)
#   dataset/manifest.*      manifests + vocabulary + CMVN stats
#   lm/synth_lm.arpa        in-repo trigram on the train transcripts
# Then train with:
#   tools/train_watchdog.sh <workdir> configs/campaign/conformer_synth.yml \
#       <workdir>/train_conformer.log 40
set -eu
REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
WORK=${1:-/root/work}
mkdir -p "$WORK"
cd "$WORK"
export PYTHONPATH="$REPO_DIR${PYTHONPATH:+:$PYTHONPATH}"

if [ ! -f dataset_src/annotation/test.txt ]; then
  echo "[setup] generating 30 h synthetic corpus (seed 17, ~15 min on 2 CPUs)"
  python "$REPO_DIR/tools/synth_corpus.py" --output_dir="$WORK/dataset_src" \
    --n_train=30000 --n_test=1000 --workers=2 --seed=17
fi

if [ ! -f dataset/mean_istd.json ]; then
  echo "[setup] create_data: manifests + vocab + CMVN"
  JAX_PLATFORMS=cpu python "$REPO_DIR/create_data.py" \
    --configs="$REPO_DIR/configs/campaign/conformer_synth.yml" \
    --annotation_path="$WORK/dataset_src/annotation" \
    --noise_dir="$WORK/dataset_src/audio/noise" \
    --num_samples=3000
fi

# keep the workspace consistent with the committed checkpoint: its
# GlobalCMVN/vocab were baked from these exact files (ADVICE r4: an
# unseeded recompute cannot reproduce them)
for f in mean_istd.json vocabulary.txt; do
  if [ -f "$REPO_DIR/dataset/$f" ]; then
    cp "$REPO_DIR/dataset/$f" "dataset/$f"
  fi
done

if [ ! -f lm/synth_lm.arpa ]; then
  echo "[setup] trigram LM on train transcripts"
  JAX_PLATFORMS=cpu python "$REPO_DIR/tools/create_kenlm_corpus.py" \
    --train_manifest=dataset/manifest.train --output_path=lm/corpus.txt
  JAX_PLATFORMS=cpu python "$REPO_DIR/tools/train_ngram_lm.py" \
    --corpus=lm/corpus.txt --output_path=lm/synth_lm.arpa --order=3
fi
echo "[setup] workspace ready: $WORK"
