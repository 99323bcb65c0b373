from qbn_tpu.serving.export import (LoadedPredictor, export_predictor,
                                    load_predictor, make_predictor)

__all__ = ["LoadedPredictor", "export_predictor", "load_predictor",
           "make_predictor"]
