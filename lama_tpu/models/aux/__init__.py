from .resnet import ResNetDilatedEncoder
from .vgg import VGGFeatures, VGG16_CFG, VGG19_CFG
from .inception import FIDInceptionV3
