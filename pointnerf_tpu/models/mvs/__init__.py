"""MVS point-cloud initialization stack (reference: models/mvs/, models/depth_estimators/)."""
