"""
Classifier-training toolchain: crop extraction, dataset creation with
location-aware splits, label-spec validation, model evaluation, and
merging classification results back into detection files.

Mirrors the reference's legacy MegaClassifier toolchain
(megadetector/classification/: crop_detections.py,
create_classification_dataset.py, json_validator.py, evaluate_model.py,
merge_classification_detection_output.py) with local-filesystem data
sources (the reference's MegaDB/Azure paths have no analog in this
environment) and the JAX classifier stack
(models/efficientnet.py + training/train_classifier.py) in place of
torch. File contracts — crop naming, CSV columns, label_index.json,
splits.json, the merged classifications format — follow the reference
so downstream tools interoperate.
"""
