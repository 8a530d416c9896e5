from hemx.ops import initializers, layers, activations, losses, images
