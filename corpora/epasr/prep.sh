#!/bin/bash
# EuroParl-ASR (en) preparation — runnable equivalent of the reference's
# corpora/epasr/prep.sh: ffmpeg m4a->wav 16 kHz, json/stm segmentation,
# fbank + CMVN, BPE encode with the TED-LIUM2 sp10k model.
#
# Usage: bash corpora/epasr/prep.sh [--stage N] [--stop M] [data_root] [ted2_sp10k_dir]
# Needs ffmpeg on PATH for stage 0; the EuroParl-ASR release unpacked at
# $data_root/data/orig/release (https://www.mllp.upv.es/europarl-asr/).
set -euo pipefail

STAGE=0
STOP=99
if [ "${1:-}" = "--stage" ]; then STAGE=$2; shift 2; fi
if [ "${1:-}" = "--stop" ]; then STOP=$2; shift 2; fi
ROOT=${1:-corpora/epasr}
SP10K=${2:-corpora/ted2/data/sp10k}
DATA=$ROOT/data
ORIG=$DATA/orig/release/en
PREP="python -m emoasr_tpu.corpora.prep"
mkdir -p "$DATA"

need() { command -v "$1" >/dev/null || { echo "ERROR: $1 not on PATH (needed for this stage)"; exit 1; }; }

TRAIN=$ORIG/train/original_audio/speeches
DEV_DEP=$ORIG/dev/original_audio/spk-dep/speeches
DEV_INDEP=$ORIG/dev/original_audio/spk-indep/speeches
TEST_DEP=$ORIG/test/original_audio/spk-dep/speeches
TEST_INDEP=$ORIG/test/original_audio/spk-indep/speeches

if [ "$STAGE" -le 0 ] && [ "$STOP" -ge 0 ]; then
    echo "== stage 0: m4a -> wav 16 kHz (ffmpeg) =="
    need ffmpeg
    for set in "$TRAIN" "$DEV_DEP" "$DEV_INDEP" "$TEST_DEP" "$TEST_INDEP"; do
        find "$set" -name "*.m4a" | while read -r m4a; do
            wav=${m4a%.m4a}.wav
            [ -f "$wav" ] || ffmpeg -y -i "$m4a" -ar 16000 "$wav" -loglevel error
        done
    done
fi

if [ "$STAGE" -le 1 ] && [ "$STOP" -ge 1 ]; then
    echo "== stage 1: segmentation (train: json; dev/test: stm) =="
    mkdir -p "$DATA/train"
    $PREP make_utts_json "$TRAIN" "$DATA/train" "$DATA/train_wav.tsv" \
        --json_ext ".tr.verb.json"
    $PREP make_utts_stm "$ORIG/dev/original_audio/spk-dep/refs" "$DEV_DEP" \
        "$DATA/dev_dep" "$DATA/dev_dep_wav.tsv"
    $PREP make_utts_stm "$ORIG/dev/original_audio/spk-indep/refs" "$DEV_INDEP" \
        "$DATA/dev_indep" "$DATA/dev_indep_wav.tsv"
    $PREP make_utts_stm "$ORIG/test/original_audio/spk-dep/refs" "$TEST_DEP" \
        "$DATA/test_dep" "$DATA/test_dep_wav.tsv"
    $PREP make_utts_stm "$ORIG/test/original_audio/spk-indep/refs" "$TEST_INDEP" \
        "$DATA/test_indep" "$DATA/test_indep_wav.tsv"
    for set in dev_dep dev_indep test_dep test_indep; do
        out=$($PREP rm_utt "$DATA/${set}_wav.tsv" \
            -texts ignore_time_segment_in_scoring | tail -1)
        mv "$out" "$DATA/${set}_wav.tsv"
    done
fi

if [ "$STAGE" -le 2 ] && [ "$STOP" -ge 2 ]; then
    echo "== stage 2: wav -> fbank + CMVN (train stats) =="
    for set in train dev_dep dev_indep test_dep test_indep; do
        $PREP wav_to_feats "$DATA/${set}_wav.tsv"
    done
    for set in train dev_dep dev_indep test_dep test_indep; do
        $PREP norm_feats "$DATA/${set}_wav.tsv" "$DATA/train_wav_norm.pkl"
    done
fi

if [ "$STAGE" -le 3 ] && [ "$STOP" -ge 3 ]; then
    echo "== stage 3: BPE encode with the TED-LIUM2 sp10k model =="
    mkdir -p "$DATA/tedsp10k"
    for set in train dev_dep dev_indep test_dep test_indep; do
        out=$($PREP spm_encode "$DATA/${set}_wav.tsv" \
            -model "$SP10K/sp10k.model" \
            -out "$DATA/tedsp10k/${set}.tsv" | tail -1)
        $PREP prep_tsv "$out" > /dev/null
    done
    $PREP sort_bylen "$DATA/tedsp10k/train.tsv"
fi

echo "done."
