"""Gold feature builders (reference src/10*, 11*, and the
documented-but-missing 12_build_feature_training_row)."""
