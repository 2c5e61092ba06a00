#!/bin/bash
# TED-LIUM2 corpus preparation — runnable equivalent of the reference's
# corpora/ted2/prep.sh (download -> sph2pipe -> sox speed perturb -> stm
# segmentation -> fbank -> CMVN -> BPE 10k -> manifests), driving our prep
# CLI (python -m emoasr_tpu.corpora.prep) for every Python stage.
#
# Our CLI stages print their output path; this script chains them.
#
# Usage: bash corpora/ted2/prep.sh [--stage N] [--stop M] [data_root]
# Needs network + sph2pipe + sox on PATH for stages 0-2; sentencepiece
# for stage 5 (offline CPU tooling, gated in the CLI).
set -euo pipefail

STAGE=0
STOP=99
if [ "${1:-}" = "--stage" ]; then STAGE=$2; shift 2; fi
if [ "${1:-}" = "--stop" ]; then STOP=$2; shift 2; fi
ROOT=${1:-corpora/ted2}
DATA=$ROOT/data
PREP="python -m emoasr_tpu.corpora.prep"
mkdir -p "$DATA/orig"

need() { command -v "$1" >/dev/null || { echo "ERROR: $1 not on PATH (needed for this stage)"; exit 1; }; }

if [ "$STAGE" -le 0 ] && [ "$STOP" -ge 0 ]; then
    echo "== stage 0: download TEDLIUM_release2 =="
    need wget
    wget -c http://www.openslr.org/resources/19/TEDLIUM_release2.tar.gz -P "$DATA/orig"
    tar xzf "$DATA/orig/TEDLIUM_release2.tar.gz" -C "$DATA/orig"
fi

TED=$DATA/orig/TEDLIUM_release2

if [ "$STAGE" -le 1 ] && [ "$STOP" -ge 1 ]; then
    echo "== stage 1: sph -> wav (sph2pipe) =="
    need sph2pipe
    for set in train dev test; do
        mkdir -p "$TED/$set/wav"
        for sph in "$TED/$set"/sph/*.sph; do
            wav=$TED/$set/wav/$(basename "${sph%.sph}").wav
            [ -f "$wav" ] || sph2pipe -f wav -p "$sph" "$wav"
        done
    done
fi

if [ "$STAGE" -le 2 ] && [ "$STOP" -ge 2 ]; then
    echo "== stage 2: speed perturbation 0.9/1.0/1.1 (sox, train only) =="
    need sox
    mkdir -p "$TED/train/wav_sp"
    for speed in 0.9 1.0 1.1; do
        for wav in "$TED/train"/wav/*.wav; do
            sp=$TED/train/wav_sp/sp${speed}-$(basename "$wav")
            [ -f "$sp" ] || sox "$wav" "$sp" speed "$speed"
        done
    done
    for set in dev test; do
        mkdir -p "$TED/$set/wav_sp"
        cp -n "$TED/$set"/wav/*.wav "$TED/$set/wav_sp/" || true
    done
fi

if [ "$STAGE" -le 3 ] && [ "$STOP" -ge 3 ]; then
    echo "== stage 3: stm segmentation -> per-utterance wav + manifest =="
    for set in train dev test; do
        mkdir -p "$DATA/$set/feats"
        if [ "$set" = train ]; then
            tsv=$($PREP make_utts_stm "$TED/$set/stm" "$TED/$set/wav_sp" \
                "$DATA/$set/feats" "$DATA/${set}_utts.tsv" \
                --extend_time --speed_perturb | tail -1)
        else
            tsv=$($PREP make_utts_stm "$TED/$set/stm" "$TED/$set/wav_sp" \
                "$DATA/$set/feats" "$DATA/${set}_utts.tsv" | tail -1)
        fi
        # drop `ignore_time_segment_in_scoring`; join clitics (it 's -> it's)
        tsv=$($PREP rm_utt "$tsv" -texts ignore_time_segment_in_scoring | tail -1)
        $PREP join_suffix "$tsv" > /dev/null   # in place
        mv "$tsv" "$DATA/${set}_feats.tsv"
    done
fi

if [ "$STAGE" -le 4 ] && [ "$STOP" -ge 4 ]; then
    echo "== stage 4: wav -> 80-dim log-mel fbank (.npy) + train CMVN =="
    for set in train dev test; do
        $PREP wav_to_feats "$DATA/${set}_feats.tsv"
    done
    for set in train dev test; do
        $PREP norm_feats "$DATA/${set}_feats.tsv" "$DATA/train_feats_norm.pkl"
    done
fi

if [ "$STAGE" -le 5 ] && [ "$STOP" -ge 5 ]; then
    echo "== stage 5: BPE 10k + final manifests =="
    mkdir -p "$DATA/sp10k"
    $PREP get_cols "$DATA/train_feats.tsv" -cols text --no_header \
        -out "$DATA/train_feats.txt" > /dev/null
    $PREP spm_train "$DATA/train_feats.txt" \
        -model_prefix "$DATA/sp10k/sp10k" -vocab_size 10000
    for set in train dev test; do
        out=$($PREP spm_encode "$DATA/${set}_feats.tsv" \
            -model "$DATA/sp10k/sp10k.model" \
            -out "$DATA/sp10k/${set}.tsv" | tail -1)
        $PREP prep_tsv "$out" > /dev/null   # wav_path -> feat_path, xlen/ylen
    done
    $PREP sort_bylen "$DATA/sp10k/train.tsv"
fi

echo "done."
