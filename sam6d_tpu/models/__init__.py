"""Model zoo: PEM (pose estimation) and ISM (instance segmentation)."""
