"""Independent torch reference implementations used by the weight-converter
forward-equivalence tests.

`TorchPoseHRNet` follows the official pose_hrnet graph (leaderboard HRNet,
deep-high-resolution-net.pytorch `lib/models/pose_hrnet.py`) with the
official module naming, so `load_state_dict` on a converter-exported dict
is itself a naming check. `TorchYoloV5` follows ultralytics yolov5 v6.0
(`models/yolo.py` + `models/common.py`) with the `model.{i}.*` naming.

These run real torch convs (OIHW, symmetric padding), which is the point:
a converter bug in layout, padding, ordering or BN wiring shows up as a
forward mismatch that a flax-to-flax round trip can never catch.
"""

import torch
import torch.nn as nn


# --------------------------------------------------------------------- #
# pose_hrnet


def conv3(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 3, stride, 1, bias=False)


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = conv3(planes, planes, stride)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + r)


class TorchBasicBlock(nn.Module):
    def __init__(self, planes):
        super().__init__()
        self.conv1 = conv3(planes, planes)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = conv3(planes, planes)
        self.bn2 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + x)


class TorchHRModule(nn.Module):
    def __init__(self, channels, num_blocks=4, multi_scale_output=True):
        super().__init__()
        self.channels = channels
        self.multi_scale_output = multi_scale_output
        self.branches = nn.ModuleList([
            nn.Sequential(*[TorchBasicBlock(c) for _ in range(num_blocks)])
            for c in channels
        ])
        n = len(channels)
        rows = n if multi_scale_output else 1
        fuse = []
        for i in range(rows):
            row = []
            for j in range(n):
                if j == i:
                    row.append(nn.Identity())
                elif j > i:
                    row.append(nn.Sequential(
                        nn.Conv2d(channels[j], channels[i], 1, bias=False),
                        nn.BatchNorm2d(channels[i]),
                        nn.Upsample(scale_factor=2 ** (j - i),
                                    mode="nearest"),
                    ))
                else:
                    steps = []
                    for s in range(i - j):
                        last = s == i - j - 1
                        cout = channels[i] if last else channels[j]
                        seq = [conv3(channels[j], cout, 2),
                               nn.BatchNorm2d(cout)]
                        if not last:
                            seq.append(nn.ReLU(inplace=True))
                        steps.append(nn.Sequential(*seq))
                    row.append(nn.Sequential(*steps))
            fuse.append(nn.ModuleList(row))
        self.fuse_layers = nn.ModuleList(fuse)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, xs):
        xs = [b(x) for b, x in zip(self.branches, xs)]
        outs = []
        for i in range(len(self.fuse_layers)):
            acc = None
            for j in range(len(self.channels)):
                y = self.fuse_layers[i][j](xs[j])
                acc = y if acc is None else acc + y
            outs.append(self.relu(acc))
        return outs


class TorchPoseHRNet(nn.Module):
    """Official pose_hrnet graph + naming (W=32/48, 17 keypoints)."""

    def __init__(self, width=32, num_keypoints=17,
                 stage_modules=(1, 4, 3)):
        super().__init__()
        self.conv1 = conv3(3, 64, 2)
        self.bn1 = nn.BatchNorm2d(64)
        self.conv2 = conv3(64, 64, 2)
        self.bn2 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)

        down = nn.Sequential(nn.Conv2d(64, 256, 1, bias=False),
                             nn.BatchNorm2d(256))
        self.layer1 = nn.Sequential(
            TorchBottleneck(64, 64, downsample=down),
            *[TorchBottleneck(256, 64) for _ in range(3)],
        )

        w = width
        stage_channels = [(w, 2 * w), (w, 2 * w, 4 * w),
                          (w, 2 * w, 4 * w, 8 * w)]
        prev = (256,)
        for si, (mods, chans) in enumerate(zip(stage_modules,
                                               stage_channels)):
            trans = []
            for i, c in enumerate(chans):
                if i < len(prev):
                    if prev[i] != c:
                        trans.append(nn.Sequential(
                            conv3(prev[i], c), nn.BatchNorm2d(c),
                            nn.ReLU(inplace=True),
                        ))
                    else:
                        trans.append(nn.Identity())
                else:
                    trans.append(nn.Sequential(nn.Sequential(
                        conv3(prev[-1], c, 2), nn.BatchNorm2d(c),
                        nn.ReLU(inplace=True),
                    )))
            setattr(self, f"transition{si + 1}", nn.ModuleList(trans))
            modules = []
            for m in range(mods):
                last_overall = (si == len(stage_modules) - 1
                                and m == mods - 1)
                modules.append(TorchHRModule(
                    chans, multi_scale_output=not last_overall,
                ))
            setattr(self, f"stage{si + 2}", nn.Sequential(*modules))
            prev = chans

        self.final_layer = nn.Conv2d(w, num_keypoints, 1)
        self._stage_channels = stage_channels

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        xs = [x]
        for si in range(3):
            trans = getattr(self, f"transition{si + 1}")
            chans = self._stage_channels[si]
            nxt = []
            for i in range(len(chans)):
                src = xs[i] if i < len(xs) else xs[-1]
                nxt.append(trans[i](src))
            xs = nxt
            for mod in getattr(self, f"stage{si + 2}"):
                xs = mod(xs)
        return self.final_layer(xs[0])


# --------------------------------------------------------------------- #
# HigherHRNet (official pose_higher_hrnet naming: shared trunk +
# final_layers ModuleList + deconv_layers)


class TorchHigherHRNet(TorchPoseHRNet):
    """Official PoseHigherResolutionNet graph + naming: the pose_hrnet
    trunk (inherited) with the final_layer replaced by the two-head +
    deconv structure (`final_layers.{0,1}`, `deconv_layers.0`)."""

    def __init__(self, width=32, num_keypoints=17,
                 stage_modules=(1, 4, 3), num_deconv_blocks=4):
        super().__init__(width, num_keypoints, stage_modules)
        del self.final_layer
        w, k = width, num_keypoints
        self.final_layers = nn.ModuleList([
            nn.Conv2d(w, 2 * k, 1),           # heatmaps + AE tags @ 1/4
            nn.Conv2d(w, k, 1),               # heatmaps @ 1/2
        ])
        deconv = [nn.Sequential(
            nn.ConvTranspose2d(w + 2 * k, w, 4, stride=2, padding=1,
                               bias=False),
            nn.BatchNorm2d(w),
            nn.ReLU(inplace=True),
        )]
        for _ in range(num_deconv_blocks):
            deconv.append(nn.Sequential(TorchBasicBlock(w)))
        self.deconv_layers = nn.ModuleList([nn.Sequential(*deconv)])

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        xs = [x]
        for si in range(3):
            trans = getattr(self, f"transition{si + 1}")
            chans = self._stage_channels[si]
            nxt = []
            for i in range(len(chans)):
                src = xs[i] if i < len(xs) else xs[-1]
                nxt.append(trans[i](src))
            xs = nxt
            for mod in getattr(self, f"stage{si + 2}"):
                xs = mod(xs)
        feat = xs[0]
        out1 = self.final_layers[0](feat)
        d = self.deconv_layers[0](torch.cat([feat, out1], dim=1))
        out2 = self.final_layers[1](d)
        return out1, out2


# --------------------------------------------------------------------- #
# yolov5 v6.0 (ultralytics naming: model.{i}.*)


def _autopad(k):
    return k // 2


class TorchYoloConv(nn.Module):
    def __init__(self, cin, cout, k=1, s=1, p=None):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, s,
                              _autopad(k) if p is None else p, bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TorchYoloBottleneck(nn.Module):
    def __init__(self, cin, cout, shortcut=True):
        super().__init__()
        self.cv1 = TorchYoloConv(cin, cout, 1)
        self.cv2 = TorchYoloConv(cout, cout, 3)
        self.add = shortcut and cin == cout

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TorchC3(nn.Module):
    def __init__(self, cin, cout, n=1, shortcut=True):
        super().__init__()
        c_ = cout // 2
        self.cv1 = TorchYoloConv(cin, c_, 1)
        self.cv2 = TorchYoloConv(cin, c_, 1)
        self.cv3 = TorchYoloConv(2 * c_, cout, 1)
        self.m = nn.Sequential(
            *[TorchYoloBottleneck(c_, c_, shortcut) for _ in range(n)]
        )

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class TorchSPPF(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        c_ = cin // 2
        self.cv1 = TorchYoloConv(cin, c_, 1)
        self.cv2 = TorchYoloConv(c_ * 4, cout, 1)
        self.m = nn.MaxPool2d(5, 1, 2)

    def forward(self, x):
        x = self.cv1(x)
        y1 = self.m(x)
        y2 = self.m(y1)
        return self.cv2(torch.cat((x, y1, y2, self.m(y2)), 1))


class TorchDetect(nn.Module):
    def __init__(self, nc, chs):
        super().__init__()
        self.m = nn.ModuleList(
            nn.Conv2d(c, 3 * (nc + 5), 1) for c in chs
        )

    def forward(self, xs):
        return [m(x) for m, x in zip(self.m, xs)]


class TorchYoloV5(nn.Module):
    """yolov5 v6.0 graph with the sequential `model.{i}` naming."""

    def __init__(self, depth=0.33, width=0.50, nc=80):
        super().__init__()
        import math

        def w(x):
            return int(math.ceil(x * width / 8) * 8)

        def d(x):
            return max(1, round(x * depth))

        layers = [
            TorchYoloConv(3, w(64), 6, 2, 2),          # 0 stem
            TorchYoloConv(w(64), w(128), 3, 2),        # 1
            TorchC3(w(128), w(128), d(3)),             # 2
            TorchYoloConv(w(128), w(256), 3, 2),       # 3
            TorchC3(w(256), w(256), d(6)),             # 4 -> P3
            TorchYoloConv(w(256), w(512), 3, 2),       # 5
            TorchC3(w(512), w(512), d(9)),             # 6 -> P4
            TorchYoloConv(w(512), w(1024), 3, 2),      # 7
            TorchC3(w(1024), w(1024), d(3)),           # 8
            TorchSPPF(w(1024), w(1024)),               # 9 -> P5
            TorchYoloConv(w(1024), w(512), 1),         # 10
            nn.Upsample(scale_factor=2, mode="nearest"),  # 11
            nn.Identity(),                             # 12 concat
            TorchC3(w(1024), w(512), d(3), False),     # 13
            TorchYoloConv(w(512), w(256), 1),          # 14
            nn.Upsample(scale_factor=2, mode="nearest"),  # 15
            nn.Identity(),                             # 16 concat
            TorchC3(w(512), w(256), d(3), False),      # 17 -> out P3
            TorchYoloConv(w(256), w(256), 3, 2),       # 18
            nn.Identity(),                             # 19 concat
            TorchC3(w(512), w(512), d(3), False),      # 20 -> out P4
            TorchYoloConv(w(512), w(512), 3, 2),       # 21
            nn.Identity(),                             # 22 concat
            TorchC3(w(1024), w(1024), d(3), False),    # 23 -> out P5
            TorchDetect(nc, [w(256), w(512), w(1024)]),  # 24
        ]
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        m = self.model
        x = m[0](x)
        x = m[1](x)
        x = m[2](x)
        x = m[3](x)
        p3 = m[4](x)
        x = m[5](p3)
        p4 = m[6](x)
        x = m[7](p4)
        x = m[8](x)
        p5 = m[9](x)
        t5 = m[10](p5)
        x = torch.cat((m[11](t5), p4), 1)
        h4 = m[13](x)
        t4 = m[14](h4)
        x = torch.cat((m[15](t4), p3), 1)
        out3 = m[17](x)
        x = torch.cat((m[18](out3), t4), 1)
        out4 = m[20](x)
        x = torch.cat((m[21](out4), t5), 1)
        out5 = m[23](x)
        return m[24]([out3, out4, out5])
