"""Plain-torch restatement of torchvision's RAFT-large (golden oracle).

State_dict-key compatible with ``torchvision.models.optical_flow.raft_large``
so the same randomised weights drive both this oracle and
``mhada_tpu.models.raft.import_raft``.  Restated from the torchvision
architecture the reference depends on (reference datasets.py:98,
exps_video.py:45); forward follows torchvision raft.py semantics:
12 recurrent updates, align_corners=True correlation lookup, convex 8x
upsampling.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def conv_norm_act(c_in, c_out, kernel_size, stride=1, norm_layer=None,
                  activation=True):
    """torchvision Conv2dNormActivation with bias=True (RAFT keeps biases)."""
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    padding = tuple((k - 1) // 2 for k in kernel_size)
    layers = [nn.Conv2d(c_in, c_out, kernel_size, stride, padding, bias=True)]
    if norm_layer is not None:
        layers.append(norm_layer(c_out))
    if activation:
        layers.append(nn.ReLU())
    return nn.Sequential(*layers)


class ResidualBlock(nn.Module):
    def __init__(self, c_in, c_out, norm_layer, stride=1):
        super().__init__()
        self.convnormrelu1 = conv_norm_act(c_in, c_out, 3, stride, norm_layer)
        self.convnormrelu2 = conv_norm_act(c_out, c_out, 3, 1, norm_layer)
        if stride == 1:
            self.downsample = nn.Identity()
        else:
            self.downsample = conv_norm_act(c_in, c_out, 1, stride, norm_layer,
                                            activation=False)
        self.relu = nn.ReLU()

    def forward(self, x):
        y = self.convnormrelu2(self.convnormrelu1(x))
        return self.relu(self.downsample(x) + y)


class FeatureEncoder(nn.Module):
    def __init__(self, norm_layer):
        super().__init__()
        self.convnormrelu = conv_norm_act(3, 64, 7, 2, norm_layer)
        self.layer1 = nn.Sequential(ResidualBlock(64, 64, norm_layer, 1),
                                    ResidualBlock(64, 64, norm_layer, 1))
        self.layer2 = nn.Sequential(ResidualBlock(64, 96, norm_layer, 2),
                                    ResidualBlock(96, 96, norm_layer, 1))
        self.layer3 = nn.Sequential(ResidualBlock(96, 128, norm_layer, 2),
                                    ResidualBlock(128, 128, norm_layer, 1))
        self.conv = nn.Conv2d(128, 256, 1)

    def forward(self, x):
        return self.conv(self.layer3(self.layer2(self.layer1(
            self.convnormrelu(x)))))


def make_coords_grid(batch, h, w):
    coords = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    coords = torch.stack(coords[::-1], dim=0).float()  # (2, h, w), (x, y)
    return coords[None].repeat(batch, 1, 1, 1)


def grid_sample_abs(img, absolute_grid):
    """torchvision raft _utils.grid_sample: absolute coords -> [-1,1],
    align_corners=True, bilinear, zero padding."""
    h, w = img.shape[-2:]
    xgrid, ygrid = absolute_grid.split([1, 1], dim=-1)
    xgrid = 2 * xgrid / (w - 1) - 1
    ygrid = 2 * ygrid / (h - 1) - 1
    grid = torch.cat([xgrid, ygrid], dim=-1)
    return F.grid_sample(img, grid, mode="bilinear", align_corners=True)


class CorrBlock:
    def __init__(self, num_levels=4, radius=4):
        self.num_levels = num_levels
        self.radius = radius
        self.corr_pyramid = []

    def build_pyramid(self, fmap1, fmap2):
        b, c, h, w = fmap1.shape
        corr = torch.matmul(
            fmap1.view(b, c, h * w).transpose(1, 2), fmap2.view(b, c, h * w)
        ) / math.sqrt(c)
        corr = corr.view(b * h * w, 1, h, w)
        self.corr_pyramid = [corr]
        for _ in range(self.num_levels - 1):
            corr = F.avg_pool2d(corr, 2, stride=2)
            self.corr_pyramid.append(corr)

    def index_pyramid(self, centroids_coords):
        side = 2 * self.radius + 1
        di = torch.linspace(-self.radius, self.radius, side)
        dj = torch.linspace(-self.radius, self.radius, side)
        delta = torch.stack(torch.meshgrid(di, dj, indexing="ij"), dim=-1)
        delta = delta.view(1, side, side, 2)
        b, _, h, w = centroids_coords.shape
        centroids_coords = centroids_coords.permute(0, 2, 3, 1).reshape(
            b * h * w, 1, 1, 2)
        indexed = []
        for corr_volume in self.corr_pyramid:
            sampling_coords = centroids_coords + delta
            iv = grid_sample_abs(corr_volume, sampling_coords).view(b, h, w, -1)
            indexed.append(iv)
            centroids_coords = centroids_coords / 2
        return torch.cat(indexed, dim=-1).permute(0, 3, 1, 2).contiguous()


class MotionEncoder(nn.Module):
    def __init__(self, in_channels_corr=324):
        super().__init__()
        self.convcorr1 = conv_norm_act(in_channels_corr, 256, 1)
        self.convcorr2 = conv_norm_act(256, 192, 3)
        self.convflow1 = conv_norm_act(2, 128, 7)
        self.convflow2 = conv_norm_act(128, 64, 3)
        self.conv = conv_norm_act(192 + 64, 128 - 2, 3)

    def forward(self, flow, corr_features):
        corr = self.convcorr2(self.convcorr1(corr_features))
        flow_orig = flow
        flow = self.convflow2(self.convflow1(flow))
        cf = self.conv(torch.cat([corr, flow], dim=1))
        return torch.cat([cf, flow_orig], dim=1)


class ConvGRU(nn.Module):
    def __init__(self, input_size, hidden_size, kernel_size, padding):
        super().__init__()
        self.convz = nn.Conv2d(hidden_size + input_size, hidden_size,
                               kernel_size, padding=padding)
        self.convr = nn.Conv2d(hidden_size + input_size, hidden_size,
                               kernel_size, padding=padding)
        self.convq = nn.Conv2d(hidden_size + input_size, hidden_size,
                               kernel_size, padding=padding)

    def forward(self, h, x):
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz(hx))
        r = torch.sigmoid(self.convr(hx))
        q = torch.tanh(self.convq(torch.cat([r * h, x], dim=1)))
        return (1 - z) * h + z * q


class RecurrentBlock(nn.Module):
    def __init__(self, input_size=256, hidden_size=128):
        super().__init__()
        self.convgru1 = ConvGRU(input_size, hidden_size, (1, 5), (0, 2))
        self.convgru2 = ConvGRU(input_size, hidden_size, (5, 1), (2, 0))
        self.hidden_state_size = hidden_size

    def forward(self, h, x):
        return self.convgru2(self.convgru1(h, x), x)


class FlowHead(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(128, 256, 3, padding=1)
        self.conv2 = nn.Conv2d(256, 2, 3, padding=1)
        self.relu = nn.ReLU()

    def forward(self, x):
        return self.conv2(self.relu(self.conv1(x)))


class UpdateBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.motion_encoder = MotionEncoder()
        self.recurrent_block = RecurrentBlock()
        self.flow_head = FlowHead()
        self.hidden_state_size = 128

    def forward(self, hidden_state, context, corr_features, flow):
        motion_features = self.motion_encoder(flow, corr_features)
        x = torch.cat([context, motion_features], dim=1)
        hidden_state = self.recurrent_block(hidden_state, x)
        return hidden_state, self.flow_head(hidden_state)


class MaskPredictor(nn.Module):
    def __init__(self):
        super().__init__()
        self.convrelu = conv_norm_act(128, 256, 3)
        self.conv = nn.Conv2d(256, 8 * 8 * 9, 1)

    def forward(self, x):
        return 0.25 * self.conv(self.convrelu(x))


def upsample_flow(flow, up_mask, factor=8):
    b, num_channels, h, w = flow.shape
    up_mask = up_mask.view(b, 1, 9, factor, factor, h, w)
    up_mask = torch.softmax(up_mask, dim=2)
    upsampled = F.unfold(factor * flow, kernel_size=3, padding=1)
    upsampled = upsampled.view(b, num_channels, 9, 1, 1, h, w)
    upsampled = torch.sum(up_mask * upsampled, dim=2)
    return upsampled.permute(0, 1, 4, 2, 5, 3).reshape(
        b, num_channels, h * factor, w * factor)


class RAFTRef(nn.Module):
    def __init__(self):
        super().__init__()
        self.feature_encoder = FeatureEncoder(nn.InstanceNorm2d)
        self.context_encoder = FeatureEncoder(nn.BatchNorm2d)
        self.corr_block = CorrBlock()
        self.update_block = UpdateBlock()
        self.mask_predictor = MaskPredictor()

    def forward(self, image1, image2, num_flow_updates=12):
        b, _, h, w = image1.shape
        fmaps = self.feature_encoder(torch.cat([image1, image2], dim=0))
        fmap1, fmap2 = torch.chunk(fmaps, 2, dim=0)
        self.corr_block.build_pyramid(fmap1, fmap2)

        context_out = self.context_encoder(image1)
        hs = self.update_block.hidden_state_size
        hidden_state, context = torch.split(
            context_out, [hs, context_out.shape[1] - hs], dim=1)
        hidden_state = torch.tanh(hidden_state)
        context = F.relu(context)

        coords0 = make_coords_grid(b, h // 8, w // 8)
        coords1 = make_coords_grid(b, h // 8, w // 8)
        flow_predictions = []
        for _ in range(num_flow_updates):
            coords1 = coords1.detach()
            corr_features = self.corr_block.index_pyramid(coords1)
            flow = coords1 - coords0
            hidden_state, delta_flow = self.update_block(
                hidden_state, context, corr_features, flow)
            coords1 = coords1 + delta_flow
            up_mask = self.mask_predictor(hidden_state)
            flow_predictions.append(upsample_flow(coords1 - coords0, up_mask))
        return flow_predictions
