#!/bin/bash
# Single-host eval-only / deployment wrapper — the rebuild's counterpart
# of the reference's scripts/deploy_modaltune.sh (eval_only=1 with
# trained weights, typically on an OOD site like COADREAD/BLCA). Loads
# best_model_weights.npz, re-fits the LogReg/CoxPH readout on the train
# split, scores test, and writes deploy_results.json + embeddings.

set -euo pipefail
PROJECT_DIR=$(cd "$(dirname "$0")/.." && pwd)
SEED=${SEED:-0}

ONCO_CODE=${ONCO_CODE:-COADREAD}     # BRCA NSCLC GBMLGG RCC | COADREAD BLCA (OOD)
NUM_CLASSES=2
if [ "$ONCO_CODE" = "RCC" ]; then NUM_CLASSES=3; fi

DATA_ROOT=${DATA_ROOT:-/path/to/database}
ONCO_LC=$(echo "$ONCO_CODE" | tr '[:upper:]' '[:lower:]')
TEXT_LOCATION=${DATA_ROOT}/TCGA-extractedtexts/${ONCO_CODE}_textembeddings_conch_ViT-B-16_all_v3.pt
GENE_LOCATION=${DATA_ROOT}/TCGA-genomics/processed/tcga_${ONCO_LC}_xena_clean_pathway.csv
PATHWAY_CSV=${PATHWAY_CSV:-${PROJECT_DIR}/dataset/gene_pathway_processed_v2.csv}

MIL_NAME=${MIL_NAME:-longnetvit_gene_adapter}
BACKBONE_WEIGHTS=${BACKBONE_WEIGHTS:-gigapath_backbone.npz}
MODEL_WEIGHTS=${MODEL_WEIGHTS:-./results/longnetvit_gene_adapter_exp/best_model_weights.npz}
JSON_EXT=""

python ${PROJECT_DIR}/tools/train.py \
  --train_json ${PROJECT_DIR}/dataset/json_splits/tcga_${ONCO_LC}/train_${ONCO_LC}_cls_feat${JSON_EXT}.json \
  --val_json ${PROJECT_DIR}/dataset/json_splits/tcga_${ONCO_LC}/val_${ONCO_LC}_cls_feat${JSON_EXT}.json \
  --test_json ${PROJECT_DIR}/dataset/json_splits/tcga_${ONCO_LC}/test_${ONCO_LC}_cls_feat${JSON_EXT}.json \
  --eval_only 1 \
  --num_classes ${NUM_CLASSES} \
  --mil_name ${MIL_NAME} \
  --backbone_weights ${BACKBONE_WEIGHTS} \
  --text_location ${TEXT_LOCATION} \
  --genomics_csv_path ${GENE_LOCATION} \
  --pathway_csv ${PATHWAY_CSV} \
  --seed ${SEED} \
  --eval_weights ${MODEL_WEIGHTS}
