"""Vision: frozen ResNet-101 feature extractor and the fused
resize+normalize+forward extraction pipeline."""
