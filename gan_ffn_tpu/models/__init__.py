from .baselines import (
    CNN,
    CNNFeatureExtractor,
    TextCNN,
    E2ELSTMModel,
    Emoformer,
    FullyConnection,
    LSTMModel,
    LSTMModel2,
    MELDLSTMModel,
)
from .dialogue_rnn import BiE2EModel, BiModel, DialogueRNN
from .discriminators import (
    AcousticDiscriminator,
    TextDiscriminator,
    VisualDiscriminator,
)
from .gan_ffn import GAN_FFN, GAN_FFN_DialogueRNN
from .generators import AcousticGenerator, TextGenerator, VisualGenerator

__all__ = [
    "AcousticDiscriminator",
    "AcousticGenerator",
    "BiE2EModel",
    "BiModel",
    "CNN",
    "CNNFeatureExtractor",
    "TextCNN",
    "E2ELSTMModel",
    "DialogueRNN",
    "Emoformer",
    "FullyConnection",
    "GAN_FFN",
    "GAN_FFN_DialogueRNN",
    "LSTMModel",
    "LSTMModel2",
    "MELDLSTMModel",
    "TextDiscriminator",
    "TextGenerator",
    "VisualDiscriminator",
    "VisualGenerator",
]
