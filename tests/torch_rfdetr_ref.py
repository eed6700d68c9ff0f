"""
Test-only torch mirror of models/rfdetr.py, with a state dict laid out
like real RF-DETR checkpoints (HF Dinov2WithRegisters backbone naming +
LW-DETR transformer naming), so the converter mapping is exercised on
realistic keys and the JAX forward is cross-verified numerically.

Key layout produced (consumed by convert_weights.convert_rfdetr_state_dict):
  backbone.0.encoder.embeddings.patch_embeddings.projection.{weight,bias}
  backbone.0.encoder.embeddings.{cls_token,register_tokens,position_embeddings}
  backbone.0.encoder.encoder.layer.{i}.norm1/norm2.{weight,bias}
  backbone.0.encoder.encoder.layer.{i}.attention.attention.{query,key,value}.*
  backbone.0.encoder.encoder.layer.{i}.attention.output.dense.*
  backbone.0.encoder.encoder.layer.{i}.layer_scale1/layer_scale2.lambda1
  backbone.0.encoder.encoder.layer.{i}.mlp.fc1/fc2.*
  backbone.0.out_norms.{k}.{weight,bias}
  backbone.0.projector.conv1.{weight,bias} / norm1.* / downs.{k}.* / down_norms.{k}.*
  transformer.level_embed
  transformer.enc_output.* / enc_output_norm.*
  transformer.enc_out_class_embed.* / enc_out_bbox_embed.layers.{0,1,2}.*
  transformer.ref_point_head.layers.{0,1}.*
  transformer.decoder.layers.{i}.self_attn.{in_proj_weight,in_proj_bias}
  transformer.decoder.layers.{i}.self_attn.out_proj.*
  transformer.decoder.layers.{i}.cross_attn.{sampling_offsets,attention_weights,value_proj,output_proj}.*
  transformer.decoder.layers.{i}.norm1/norm2/norm3.* / linear1/linear2.*
  transformer.decoder.norm.*
  class_embed.* / bbox_embed.layers.{0,1,2}.*
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def _inverse_sigmoid(x, eps=1e-5):
    x = x.clamp(eps, 1 - eps)
    return torch.log(x / (1 - x))


class VitBlock(nn.Module):

    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attention = nn.Module()
        self.attention.attention = nn.Module()
        self.attention.attention.query = nn.Linear(dim, dim)
        self.attention.attention.key = nn.Linear(dim, dim)
        self.attention.attention.value = nn.Linear(dim, dim)
        self.attention.output = nn.Module()
        self.attention.output.dense = nn.Linear(dim, dim)
        self.layer_scale1 = nn.Module()
        self.layer_scale1.lambda1 = nn.Parameter(
            torch.full((dim,), 1e-5))
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)
        self.layer_scale2 = nn.Module()
        self.layer_scale2.lambda1 = nn.Parameter(
            torch.full((dim,), 1e-5))

    def _attn(self, tokens):
        y = self.norm1(tokens)
        a = self.attention.attention
        q, k, v = a.query(y), a.key(y), a.value(y)
        b, n, d = q.shape
        h = self.heads
        hd = d // h

        def split(x):
            return x.view(b, n, h, hd).transpose(1, 2)

        logits = split(q) @ split(k).transpose(-1, -2) / math.sqrt(hd)
        attn = logits.float().softmax(-1).to(q.dtype)
        out = (attn @ split(v)).transpose(1, 2).reshape(b, n, d)
        out = self.attention.output.dense(out)
        return tokens + out * self.layer_scale1.lambda1

    def forward(self, x, windowed, num_windows, grid_hw, n_prefix):
        b, n, d = x.shape
        h, w = grid_hw
        if not windowed or num_windows <= 1:
            x = self._attn(x)
        else:
            nw = num_windows
            wh, ww = h // nw, w // nw
            prefix = x[:, :n_prefix]
            patches = x[:, n_prefix:].view(b, h, w, d)
            win = patches.view(b, nw, wh, nw, ww, d) \
                .permute(0, 1, 3, 2, 4, 5) \
                .reshape(b * nw * nw, wh * ww, d)
            pre = prefix.repeat_interleave(nw * nw, dim=0)
            tokens = torch.cat([pre, win], dim=1)
            tokens = self._attn(tokens)
            pre2 = tokens[:, :n_prefix] \
                .view(b, nw * nw, n_prefix, d).mean(dim=1)
            win2 = tokens[:, n_prefix:] \
                .view(b, nw, nw, wh, ww, d) \
                .permute(0, 1, 3, 2, 4, 5).reshape(b, h * w, d)
            x = torch.cat([pre2, win2], dim=1)
        y = self.norm2(x)
        y = self.mlp.fc2(F.gelu(self.mlp.fc1(y)))
        return x + y * self.layer_scale2.lambda1


class Mlp3(nn.Module):

    def __init__(self, d_in, d_hidden, d_out):
        super().__init__()
        self.layers = nn.ModuleList([
            nn.Linear(d_in, d_hidden), nn.Linear(d_hidden, d_hidden),
            nn.Linear(d_hidden, d_out)])

    def forward(self, x):
        x = F.relu(self.layers[0](x))
        x = F.relu(self.layers[1](x))
        return self.layers[2](x)


class DecoderLayer(nn.Module):

    def __init__(self, c):
        super().__init__()
        d = c.hidden_dim
        self.c = c
        self.self_attn = nn.MultiheadAttention(d, c.dec_heads,
                                               batch_first=True)
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.cross_attn = nn.Module()
        self.cross_attn.sampling_offsets = nn.Linear(
            d, c.dec_heads * c.num_levels * c.num_points * 2)
        self.cross_attn.attention_weights = nn.Linear(
            d, c.dec_heads * c.num_levels * c.num_points)
        self.cross_attn.value_proj = nn.Linear(d, d)
        self.cross_attn.output_proj = nn.Linear(d, d)
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.linear1 = nn.Linear(d, 4 * d)
        self.linear2 = nn.Linear(4 * d, d)
        self.norm3 = nn.LayerNorm(d, eps=1e-6)

    def deformable(self, queries, ref_boxes, value_levels,
                   level_shapes):
        c = self.c
        b, nq, d = queries.shape
        heads, num_points = c.dec_heads, c.num_points
        nl = len(value_levels)
        hd = d // heads

        value = torch.cat(value_levels, dim=1)
        value = self.cross_attn.value_proj(value)
        value = value.view(b, -1, heads, hd)

        offsets = self.cross_attn.sampling_offsets(queries).float() \
            .view(b, nq, heads, nl, num_points, 2)
        weights = self.cross_attn.attention_weights(queries).float() \
            .view(b, nq, heads, nl * num_points)
        weights = weights.softmax(-1).view(b, nq, heads, nl,
                                           num_points)

        ref_xy = ref_boxes[..., :2].float()
        ref_wh = ref_boxes[..., 2:].float()
        loc = ref_xy[:, :, None, None, None, :] + \
            offsets / num_points * ref_wh[:, :, None, None, None, :] \
            * 0.5

        out = torch.zeros(b, nq, heads, hd)
        start = 0
        for lvl in range(nl):
            h_l, w_l = level_shapes[lvl]
            n_l = h_l * w_l
            v_l = value[:, start:start + n_l]
            start += n_l
            xy = loc[:, :, :, lvl]
            x = xy[..., 0] * w_l - 0.5
            y = xy[..., 1] * h_l - 0.5
            x0 = torch.floor(x)
            y0 = torch.floor(y)
            fx = (x - x0).unsqueeze(-1)
            fy = (y - y0).unsqueeze(-1)

            head_idx = torch.arange(heads).view(1, 1, heads, 1)

            def gather(ix, iy):
                inside = ((ix >= 0) & (ix < w_l) &
                          (iy >= 0) & (iy < h_l))
                ixc = ix.clamp(0, w_l - 1).long()
                iyc = iy.clamp(0, h_l - 1).long()
                flat = (iyc * w_l + ixc) * heads + head_idx
                flat2 = flat.reshape(b, -1)
                g = torch.gather(
                    v_l.reshape(b, n_l * heads, hd), 1,
                    flat2.unsqueeze(-1).expand(-1, -1, hd))
                g = g.view(b, nq, heads, num_points, hd)
                return g.float() * inside.unsqueeze(-1).float()

            g00 = gather(x0, y0)
            g01 = gather(x0 + 1, y0)
            g10 = gather(x0, y0 + 1)
            g11 = gather(x0 + 1, y0 + 1)
            sampled = (g00 * (1 - fx) * (1 - fy) + g01 * fx * (1 - fy)
                       + g10 * (1 - fx) * fy + g11 * fx * fy)
            out = out + (sampled *
                         weights[:, :, :, lvl, :, None]).sum(3)
        out = out.reshape(b, nq, d)
        return self.cross_attn.output_proj(out)


class TorchRFDetr(nn.Module):
    """Mirror of models/rfdetr.apply over an RFDetrConfig."""

    def __init__(self, config):
        super().__init__()
        c = config
        self.c = c

        backbone = nn.Module()
        encoder0 = nn.Module()
        emb = nn.Module()
        pe = nn.Module()
        pe.projection = nn.Conv2d(3, c.vit_dim, c.patch, c.patch)
        emb.patch_embeddings = pe
        emb.cls_token = nn.Parameter(torch.zeros(1, 1, c.vit_dim))
        emb.register_tokens = nn.Parameter(
            torch.zeros(1, c.num_registers, c.vit_dim))
        grid = c.image_size // c.patch
        emb.position_embeddings = nn.Parameter(
            torch.randn(1, grid * grid + 1, c.vit_dim) * 0.02)
        encoder0.embeddings = emb
        inner = nn.Module()
        inner.layer = nn.ModuleList(
            [VitBlock(c.vit_dim, c.vit_heads)
             for _ in range(c.vit_depth)])
        encoder0.encoder = inner
        backbone_stage = nn.Module()
        backbone_stage.encoder = encoder0
        backbone_stage.out_norms = nn.ModuleList(
            [nn.LayerNorm(c.vit_dim, eps=1e-6)
             for _ in c.out_block_indexes])
        projector = nn.Module()
        projector.conv1 = nn.Conv2d(
            c.vit_dim * len(c.out_block_indexes), c.hidden_dim, 3,
            padding=1)
        projector.norm1 = nn.LayerNorm(c.hidden_dim, eps=1e-6)
        projector.downs = nn.ModuleList(
            [nn.Conv2d(c.hidden_dim, c.hidden_dim, 3, stride=2,
                       padding=1) for _ in range(c.num_levels - 1)])
        projector.down_norms = nn.ModuleList(
            [nn.LayerNorm(c.hidden_dim, eps=1e-6)
             for _ in range(c.num_levels - 1)])
        backbone_stage.projector = projector
        backbone.add_module('0', backbone_stage)
        self.backbone = backbone

        tr = nn.Module()
        tr.level_embed = nn.Parameter(
            torch.randn(c.num_levels, c.hidden_dim) * 0.02)
        tr.enc_output = nn.Linear(c.hidden_dim, c.hidden_dim)
        tr.enc_output_norm = nn.LayerNorm(c.hidden_dim, eps=1e-6)
        tr.enc_out_class_embed = nn.Linear(c.hidden_dim, c.num_classes)
        tr.enc_out_bbox_embed = Mlp3(c.hidden_dim, c.hidden_dim, 4)
        rph = nn.Module()
        rph.layers = nn.ModuleList([
            nn.Linear(2 * c.hidden_dim, c.hidden_dim),
            nn.Linear(c.hidden_dim, c.hidden_dim)])
        tr.ref_point_head = rph
        decoder = nn.Module()
        decoder.layers = nn.ModuleList(
            [DecoderLayer(c) for _ in range(c.dec_layers)])
        decoder.norm = nn.LayerNorm(c.hidden_dim, eps=1e-6)
        tr.decoder = decoder
        self.transformer = tr
        self.class_embed = nn.Linear(c.hidden_dim, c.num_classes)
        self.bbox_embed = Mlp3(c.hidden_dim, c.hidden_dim, 4)

        # Deformable-DETR offset init (matches rfdetr.init_params)
        for layer in decoder.layers:
            h = c.dec_heads
            nn.init.zeros_(layer.cross_attn.sampling_offsets.weight)
            thetas = torch.arange(h, dtype=torch.float32) * \
                (2 * math.pi / h)
            grid_init = torch.stack(
                [thetas.cos(), thetas.sin()], -1)
            grid_init = grid_init / grid_init.abs().max(
                -1, keepdim=True)[0]
            grid_init = grid_init.view(h, 1, 1, 2).repeat(
                1, c.num_levels, c.num_points, 1)
            for p in range(c.num_points):
                grid_init[:, :, p, :] *= p + 1
            layer.cross_attn.sampling_offsets.bias.data.copy_(
                grid_init.reshape(-1))
            nn.init.zeros_(layer.cross_attn.attention_weights.weight)
            nn.init.zeros_(layer.cross_attn.attention_weights.bias)
        nn.init.zeros_(tr.enc_out_bbox_embed.layers[2].weight)
        nn.init.zeros_(tr.enc_out_bbox_embed.layers[2].bias)
        nn.init.zeros_(self.bbox_embed.layers[2].weight)
        nn.init.zeros_(self.bbox_embed.layers[2].bias)

    def _sine_embed_2d(self, xy, dim, temperature=10000.0):
        scale = 2 * math.pi
        dim_t = torch.arange(dim // 2, dtype=torch.float32)
        dim_t = temperature ** (2 * dim_t / (dim // 2) / 2.0)
        out = []
        for i in range(2):
            v = xy[..., i:i + 1].float() * scale / dim_t
            out.append(torch.stack([v.sin(), v.cos()], dim=-1)
                       .reshape(*xy.shape[:-1], -1))
        return torch.cat(out[::-1], dim=-1)

    def forward(self, x):
        """x: [B, 3, H, W] float in [0, 1] -> (class_logits, boxes)."""

        c = self.c
        b, _, hh, ww = x.shape
        gh, gw = hh // c.patch, ww // c.patch
        stage = getattr(self.backbone, '0')
        emb = stage.encoder.embeddings
        tokens = emb.patch_embeddings.projection(x)
        tokens = tokens.flatten(2).transpose(1, 2)      # [B, N, D]

        pos = emb.position_embeddings
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        side = int(math.sqrt(patch_pos.shape[1]))
        patch_pos = patch_pos.view(1, side, side, c.vit_dim) \
            .permute(0, 3, 1, 2)
        patch_pos = F.interpolate(patch_pos, size=(gh, gw),
                                  mode='bilinear', align_corners=False)
        patch_pos = patch_pos.permute(0, 2, 3, 1) \
            .reshape(1, gh * gw, c.vit_dim)

        tokens = tokens + patch_pos
        cls_tok = (emb.cls_token + cls_pos).expand(b, -1, -1)
        regs = emb.register_tokens.expand(b, -1, -1)
        n_prefix = 1 + c.num_registers
        xx = torch.cat([cls_tok, regs, tokens], dim=1)

        feats = []
        for i, blk in enumerate(stage.encoder.encoder.layer):
            windowed = i not in c.global_block_indexes
            xx = blk(xx, windowed, c.num_windows, (gh, gw), n_prefix)
            if i in c.out_block_indexes:
                idx = list(c.out_block_indexes).index(i)
                f = stage.out_norms[idx](xx[:, n_prefix:])
                feats.append(f.view(b, gh, gw, c.vit_dim))

        cat = torch.cat(feats, dim=-1).permute(0, 3, 1, 2)
        f = stage.projector.conv1(cat).permute(0, 2, 3, 1)
        f = F.gelu(stage.projector.norm1(f))
        levels = [f]
        for down, dnorm in zip(stage.projector.downs,
                               stage.projector.down_norms):
            g = down(levels[-1].permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            levels.append(F.gelu(dnorm(g)))

        tr = self.transformer
        level_shapes = [(lv.shape[1], lv.shape[2]) for lv in levels]
        token_levels = []
        centers = []
        scales = []
        for lvl, lv in enumerate(levels):
            h_l, w_l = level_shapes[lvl]
            t = lv.reshape(b, h_l * w_l, c.hidden_dim) + \
                tr.level_embed[lvl]
            token_levels.append(t)
            ys = (torch.arange(h_l, dtype=torch.float32) + 0.5) / h_l
            xs = (torch.arange(w_l, dtype=torch.float32) + 0.5) / w_l
            cy, cx = torch.meshgrid(ys, xs, indexing='ij')
            centers.append(torch.stack(
                [cx.reshape(-1), cy.reshape(-1)], dim=-1))
            scales.append(torch.full((h_l * w_l, 2),
                                     0.1 * (2 ** lvl)))
        memory = torch.cat(token_levels, dim=1)
        anchors_xy = torch.cat(centers, dim=0)
        anchors_wh = torch.cat(scales, dim=0)

        enc = tr.enc_output_norm(tr.enc_output(memory))
        enc_logits = tr.enc_out_class_embed(enc)
        enc_score = enc_logits.float().max(-1).values
        top_idx = enc_score.topk(c.num_queries, dim=1).indices

        q_content = torch.gather(
            enc, 1, top_idx.unsqueeze(-1).expand(-1, -1, c.hidden_dim))
        anchor_xy = anchors_xy[top_idx]
        anchor_wh = anchors_wh[top_idx]
        anchor_box = torch.cat([anchor_xy, anchor_wh], dim=-1)
        delta = tr.enc_out_bbox_embed(q_content).float()
        ref_boxes = torch.sigmoid(_inverse_sigmoid(anchor_box) + delta)

        queries = q_content
        for layer in tr.decoder.layers:
            qpos = self._sine_embed_2d(ref_boxes[..., :2],
                                       c.hidden_dim)
            qpos = tr.ref_point_head.layers[1](
                F.relu(tr.ref_point_head.layers[0](qpos)))
            qc = queries + qpos
            sa, _ = layer.self_attn(qc, qc, qc, need_weights=False)
            queries = layer.norm1(queries + sa)
            ca = layer.deformable(queries + qpos, ref_boxes,
                                  token_levels, level_shapes)
            queries = layer.norm2(queries + ca)
            ff = layer.linear2(F.relu(layer.linear1(queries)))
            queries = layer.norm3(queries + ff)
            delta = self.bbox_embed(queries).float()
            ref_boxes = torch.sigmoid(
                _inverse_sigmoid(ref_boxes) + delta)

        queries = tr.decoder.norm(queries)
        class_logits = self.class_embed(queries)
        return class_logits, ref_boxes


def make_torch_rfdetr(config, seed=0):
    torch.manual_seed(seed)
    model = TorchRFDetr(config)
    model.eval()
    return model
