#!/bin/bash
# SLURM submit wrapper for ModalTune-TPU training — the rebuild's
# counterpart of the reference's scripts/submit_modaltune.sh:49-84
# (same per-site knobs: ONCO_CODE selects the split/gene/text paths and
# class count, PANCANCER dispatches the pan-cancer driver). TPU-native
# differences: no --device/--use_amp/--wandb_mode (bf16 is on by
# default, metrics go to local JSONL), and multi-host runs bootstrap
# jax.distributed from the SLURM environment via --distributed 1 —
# launch with e.g.
#   sbatch -N 4 --ntasks-per-node=1 scripts/submit_modaltune.sh
# for a 4-host TPU pod slice (each task drives its local chips).
#
#SBATCH --job-name=modaltune-tpu
#SBATCH --ntasks-per-node=1
#SBATCH --cpus-per-task=16
#SBATCH --time=24:00:00

set -euo pipefail
PROJECT_DIR=$(cd "$(dirname "$0")/.." && pwd)
SEED=${SEED:-0}

ONCO_CODE=${ONCO_CODE:-BRCA}
# ONCO_CODE=NSCLC | GBMLGG | RCC | PANCANCER | COADREAD (OOD) | BLCA (OOD)

PANCANCER=0
if [ "$ONCO_CODE" = "PANCANCER" ]; then
    PANCANCER=1            # pan-cancer driver: per-site heads + site clf
fi
# NUM_CLASSES drives the gene-baseline head width only; the adapter
# models run in feature mode and class counts come from the labelset
NUM_CLASSES=2
if [ "$ONCO_CODE" = "RCC" ]; then NUM_CLASSES=3; fi

DATA_ROOT=${DATA_ROOT:-/path/to/database}
OUTPUT_DIR=${OUTPUT_DIR:-./results}
ONCO_LC=$(echo "$ONCO_CODE" | tr '[:upper:]' '[:lower:]')
TEXT_LOCATION=${DATA_ROOT}/TCGA-extractedtexts/${ONCO_CODE}_textembeddings_conch_ViT-B-16_all_v3.pt
GENE_LOCATION=${DATA_ROOT}/TCGA-genomics/processed/tcga_${ONCO_LC}_xena_clean_pathway.csv
PATHWAY_CSV=${PATHWAY_CSV:-${PROJECT_DIR}/dataset/gene_pathway_processed_v2.csv}
CLIN_LOCATION=${CLIN_LOCATION:-}     # set to the clinical .pt to enable

# MIL_NAME=titan_gene_adapter        # TITAN backbone (threshold 15000)
MIL_NAME=${MIL_NAME:-longnetvit_gene_adapter}   # Prov-GigaPath
# append _clinical before _adapter for the +clinical variants
BACKBONE_WEIGHTS=${BACKBONE_WEIGHTS:-gigapath_backbone.npz}  # tools/convert_gigapath.py
JSON_EXT=""                          # _titan for the TITAN splits

THRESHOLD=25000                      # 15000 for TITAN
MULTI_SEED=1
NUM_TASKS=3
LR=0.0001

# multi-host only when SLURM allocated >1 task
DISTRIBUTED=0
if [ "${SLURM_NTASKS:-1}" -gt 1 ]; then DISTRIBUTED=1; fi

RUN="python ${PROJECT_DIR}/tools/train.py"
if [ -n "${SLURM_JOB_ID:-}" ]; then RUN="srun python ${PROJECT_DIR}/tools/train.py"; fi

$RUN \
  --train_json ${PROJECT_DIR}/dataset/json_splits/tcga_${ONCO_LC}/train_${ONCO_LC}_cls_feat${JSON_EXT}.json \
  --val_json ${PROJECT_DIR}/dataset/json_splits/tcga_${ONCO_LC}/val_${ONCO_LC}_cls_feat${JSON_EXT}.json \
  --test_json ${PROJECT_DIR}/dataset/json_splits/tcga_${ONCO_LC}/test_${ONCO_LC}_cls_feat${JSON_EXT}.json \
  --output_path ${OUTPUT_DIR} \
  --num_folds 1 \
  --eval_only 0 \
  --num_classes ${NUM_CLASSES} \
  --pancancer ${PANCANCER} \
  --lr ${LR} \
  --num_epochs 20 \
  --weight_decay 0.0005 \
  --save_interval 1 \
  --gc 1 \
  --mil_name ${MIL_NAME} \
  --backbone_weights ${BACKBONE_WEIGHTS} \
  --text_location ${TEXT_LOCATION} \
  --eval_interval 1 \
  --num_tasks ${NUM_TASKS} \
  --genomics_csv_path ${GENE_LOCATION} \
  --pathway_csv ${PATHWAY_CSV} \
  ${CLIN_LOCATION:+--clinical_location ${CLIN_LOCATION}} \
  --seed ${SEED} \
  --threshold ${THRESHOLD} \
  --multi_seed ${MULTI_SEED} \
  --distributed ${DISTRIBUTED} \
  --save_embeddings
