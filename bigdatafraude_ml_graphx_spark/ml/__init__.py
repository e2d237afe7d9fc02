from .pipeline import (  # noqa: F401
    assemble_features,
    train_test_split,
    train_gbt,
    evaluate_binary,
    evaluate_multiclass,
    confusion_matrix,
    threshold_alerts,
    save_model,
    load_model,
)
