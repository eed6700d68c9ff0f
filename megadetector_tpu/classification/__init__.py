"""
Classifier-training toolchain: crop extraction, dataset creation with
location-aware splits, label-spec validation, model evaluation, and
merging classification results back into detection files.

Mirrors the reference's legacy MegaClassifier toolchain
(megadetector/classification/) with local-filesystem data sources (the
reference's MegaDB/Azure paths have no offline analog) and the JAX
classifier stack (models/efficientnet.py +
training/train_classifier.py) in place of torch. File contracts — crop
naming, CSV columns, label_index.json, splits.json, the merged
classifications format — follow the reference so downstream tools
interoperate.

Module map vs the reference:
- crop_detections, create_classification_dataset, json_validator,
  evaluate_model, merge_classification_detection_output,
  run_classifier, detect_and_crop, aggregate_classifier_probs,
  map_classification_categories, identify_mislabeled_candidates,
  analyze_failed_images, save_mislabeled: same-name counterparts here.
- train_classifier / train_classifier_tf / train_utils /
  efficientnet/: one JAX trainer + model is the TPU-native answer —
  training/train_classifier.py and models/efficientnet.py.
- cache_batchapi_outputs, json_to_azcopy_list,
  prepare_classification_script(_mc), csv_to_json: Azure-Batch-era
  plumbing with no offline analog; chunked local runs are planned by
  workflows/manage_local_batch.plan_chunks, and legacy CSV results
  convert via postprocessing/convert_output_format.
"""
