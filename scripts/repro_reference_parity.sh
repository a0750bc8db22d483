#!/bin/bash
# Out-of-environment reproduction kit for the real-data accuracy contract
# (BASELINE.md: top-1 within 0.1% of the reference, consistency 82.65 —
# ref: /root/reference/README.md:77-133). The build environment has NO
# egress, so the real-weights / real-data verification must run on a
# networked machine: this script is that packaged path.
#
# Stages (run individually or 'all'):
#   fetch        download DeiT-Ti weights + CUB_200_2011.tgz (manifest:
#                scripts/repro_manifest.json), verify hashes, extract
#   prepare      bbox-crop CUB + ProtoPNet-style 30x offline augmentation
#                (scripts/prepare_cub.py)
#   train        200-epoch reference-recipe training (scripts/train_cub.sh)
#   eval         top-1 on the CUB test split for a trained checkpoint
#   consistency  EvalProtoPNet consistency score on the raw CUB tree;
#                prints the diff vs the published 82.65
#   crosscheck   (optional; needs REFERENCE_DIR + torch) export our params
#                to a reference-layout .pth and run the reference's own
#                eval_interpretability.py on it for a side-by-side score
#
# Environment knobs:
#   DATA_ROOT      where datasets land            (default: datasets)
#   WEIGHTS_URL    override the DeiT-Ti weight URL (file:// ok — stub test)
#   CUB_URL        override the CUB tarball URL    (file:// ok — stub test)
#   CHECKPOINT     trained checkpoint for eval/consistency stages: an Orbax
#                  params dir from main_train.py, or a reference .pth
#   REFERENCE_DIR  a checkout of zju-vipa/ProtoPFormer for 'crosscheck'
#   DRY_RUN=1      print the commands instead of executing (stub test)
set -eu

stage=${1:-all}
DATA_ROOT=${DATA_ROOT:-datasets}
MODEL=deit_tiny_patch16_224
WEIGHTS_URL=${WEIGHTS_URL:-https://dl.fbaipublicfiles.com/deit/deit_tiny_patch16_224-a1311bcf.pth}
CUB_URL=${CUB_URL:-https://data.caltech.edu/records/65de6-vp158/files/CUB_200_2011.tgz}
CUB_SHA256=${CUB_SHA256:-0c685df5597a8b24909f6a7c9db6d11e008733779a671760afef78feb49bf081}
CUB_RAW="$DATA_ROOT/CUB_200_2011"
CUB_CROPPED="$DATA_ROOT/cub200_cropped"

run() {
    if [ "${DRY_RUN:-0}" = "1" ]; then
        echo "DRY_RUN: $*"
    else
        "$@"
    fi
}

do_fetch() {
    run mkdir -p "$DATA_ROOT" pretrained
    # DeiT-Ti backbone weights through the repo's hash-checking registry
    # (checkpoint/pretrained.py — torch.hub check_hash=True semantics)
    run python -c "
from protopformer_tpu.checkpoint.pretrained import resolve_pretrained
import shutil
p = resolve_pretrained('$WEIGHTS_URL')
shutil.copyfile(p, 'pretrained/$MODEL.pth')
print('weights ->', 'pretrained/$MODEL.pth')
"
    if [ ! -d "$CUB_RAW" ]; then
        run python -c "
import hashlib, tarfile, urllib.request
url, want = '$CUB_URL', '$CUB_SHA256'
fn = '$DATA_ROOT/CUB_200_2011.tgz'
urllib.request.urlretrieve(url, fn)
h = hashlib.sha256(open(fn, 'rb').read()).hexdigest()
assert not want or h == want, f'CUB sha256 mismatch: {h} != {want}'
with tarfile.open(fn) as tf:
    tf.extractall('$DATA_ROOT')
print('CUB ->', '$CUB_RAW')
"
    fi
}

do_prepare() {
    run python scripts/prepare_cub.py \
        --cub_root "$CUB_RAW" --out "$CUB_CROPPED" --augment --seed 1028
}

do_train() {
    run env PRETRAINED_CKPT="pretrained/$MODEL.pth" \
        DATA_PATH="$CUB_CROPPED" \
        sh scripts/train_cub.sh "$MODEL" 128
    echo "checkpoint: output_cosine/CUB2011U/$MODEL/1028/checkpoints (pass as CHECKPOINT=)"
}

ckpt() {
    echo "${CHECKPOINT:?set CHECKPOINT=<Orbax params dir or reference .pth>}"
}

do_eval() {
    # top-1 on the CUB test split; compare against the reference's own
    # `python main.py --eval --resume <ckpt>` (ref: main.py:409-412) run on
    # the same checkpoint — the contract is |top1_ours - top1_ref| <= 0.1
    run python main_train.py \
        --eval --resume="$(ckpt)" \
        --base_architecture="$MODEL" --model="$MODEL" \
        --data_set=CUB2011U --data_path="$CUB_CROPPED" \
        --input_size=224 --batch_size=256 \
        --prototype_shape 2000 192 1 1 \
        --reserve_layers 11 --reserve_token_nums 81 \
        --use_global=True --global_coe=0.5 --global_proto_per_class=10 \
        --output_dir=output_repro
}

do_consistency() {
    # EvalProtoPNet protocol on the RAW tree (part annotations live there);
    # published reference score for this config: 82.65
    # (ref: README.md:130-133, eval_interpretability.py:309-337)
    run env DATA_PATH="$CUB_RAW" \
        sh scripts/eval_interpretability.sh "$MODEL" "$(ckpt)"
    echo "diff the printed consistency score against the published 82.65"
}

do_crosscheck() {
    : "${REFERENCE_DIR:?set REFERENCE_DIR=<zju-vipa/ProtoPFormer checkout>}"
    # export our trained params to a reference-layout torch .pth and run
    # the REFERENCE's own consistency eval on it (same protocol, their code)
    run python main_export.py \
        --resume="$(ckpt)" --base_architecture="$MODEL" --model="$MODEL" \
        --prototype_shape 2000 192 1 1 \
        --reserve_layers 11 --reserve_token_nums 81 \
        --use_global=True --global_coe=0.5 --global_proto_per_class=10 \
        --export_path=output_repro/exported_$MODEL.pth
    run env PYTHONPATH="$REFERENCE_DIR" python "$REFERENCE_DIR/eval_interpretability.py" \
        --gpuid=0 \
        --base_architecture="$MODEL" \
        --reserve_layers=11 \
        --data_path="$CUB_RAW/" \
        --prototype_shape 2000 192 1 1 \
        --use_global=True \
        --global_proto_per_class=10 \
        --resume=output_repro/exported_$MODEL.pth \
        --global_coe=0.5 \
        --reserve_token_nums=81 \
        --use_ppc_loss=True \
        --batch_size=32 \
        --out_dir=output_repro
}

case "$stage" in
    fetch) do_fetch ;;
    prepare) do_prepare ;;
    train) do_train ;;
    eval) do_eval ;;
    consistency) do_consistency ;;
    crosscheck) do_crosscheck ;;
    all)
        do_fetch
        do_prepare
        do_train
        CHECKPOINT=${CHECKPOINT:-output_cosine/CUB2011U/$MODEL/1028/checkpoints}
        do_eval
        do_consistency
        ;;
    *)
        echo "usage: $0 {fetch|prepare|train|eval|consistency|crosscheck|all}" >&2
        exit 2
        ;;
esac
