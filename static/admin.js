/* Admin UI: stat cards (animated), drag-drop batched upload (3 concurrent,
 * client-side size/type validation), searchable + sortable document table
 * with type badges and relative timestamps, per-document detail modal,
 * delete confirm modal, delete-all, health chip, keyboard shortcuts,
 * toasts. Own implementation of the reference admin page's feature set
 * (reference static/admin.js — drag-drop :126-167, batched upload :177-324,
 * table + search :326-712, health :714-735, shortcuts :109-124). */

const API = "";
const CONCURRENT_UPLOADS = 3;
const MAX_FILE_MB = 50;
const ALLOWED_EXT = new Set([
  "pdf", "docx", "pptx", "html", "htm", "txt", "md", "markdown",
  "png", "jpg", "jpeg", "gif", "bmp", "webp",
]);

const docTable = document.getElementById("doc-table");
const docSearch = document.getElementById("doc-search");
const dropzone = document.getElementById("dropzone");
const fileInput = document.getElementById("admin-file-input");
const progress = document.getElementById("admin-upload-progress");
const modal = document.getElementById("confirm-modal");
const confirmText = document.getElementById("confirm-text");
const detailModal = document.getElementById("detail-modal");
const detailBody = document.getElementById("detail-body");
const healthChip = document.getElementById("health-chip");

let allDocs = [];
let pendingDelete = null;
let sortKey = "timestamp";
let sortDir = -1; // newest first

/* ---------------- toasts ---------------- */

function toast(msg, kind = "info") {
  const el = document.createElement("div");
  el.className = `toast ${kind}`;
  el.textContent = msg;
  document.getElementById("toasts").appendChild(el);
  setTimeout(() => el.classList.add("show"), 10);
  setTimeout(() => { el.classList.remove("show");
                     setTimeout(() => el.remove(), 300); }, 4000);
}

/* ---------------- formatting helpers ---------------- */

function escapeHtml(s) {
  const d = document.createElement("div");
  d.textContent = s == null ? "" : String(s);
  return d.innerHTML;
}

function formatFileSize(bytes) {
  if (!Number.isFinite(bytes)) return "";
  const units = ["B", "KB", "MB", "GB"];
  let i = 0;
  while (bytes >= 1024 && i < units.length - 1) { bytes /= 1024; i++; }
  return `${bytes.toFixed(i ? 1 : 0)} ${units[i]}`;
}

function fileExt(name) {
  const m = /\.([A-Za-z0-9]+)$/.exec(name || "");
  return m ? m[1].toLowerCase() : "";
}

function typeBadge(filename) {
  const ext = fileExt(filename);
  const cls =
    ext === "pdf" ? "pdf"
    : ["docx", "pptx"].includes(ext) ? "office"
    : ["png", "jpg", "jpeg", "gif", "bmp", "webp"].includes(ext) ? "img"
    : ["md", "markdown", "html", "htm"].includes(ext) ? "markup"
    : "txt";
  return `<span class="badge ${cls}">${ext || "txt"}</span>`;
}

function relTime(iso) {
  if (!iso) return "";
  const t = new Date(iso).getTime();
  if (!Number.isFinite(t)) return "";
  const s = Math.max(0, (Date.now() - t) / 1000);
  if (s < 60) return "vừa xong";
  if (s < 3600) return `${Math.floor(s / 60)} phút trước`;
  if (s < 86400) return `${Math.floor(s / 3600)} giờ trước`;
  return `${Math.floor(s / 86400)} ngày trước`;
}

/* ---------------- stats (animated) + health ---------------- */

function animateValue(el, target) {
  const start = parseInt(el.dataset.value || "0", 10) || 0;
  if (start === target) { el.textContent = target; return; }
  el.dataset.value = target;
  const t0 = performance.now();
  const dur = 400;
  function tick(now) {
    const p = Math.min(1, (now - t0) / dur);
    el.textContent = Math.round(start + (target - start) * p);
    if (p < 1) requestAnimationFrame(tick);
  }
  requestAnimationFrame(tick);
}

async function refreshStats() {
  try {
    const resp = await fetch(`${API}/stats`);
    const s = await resp.json();
    animateValue(document.getElementById("stat-docs"), s.documents.total);
    animateValue(document.getElementById("stat-text"),
                 s.documents.by_type.text);
    animateValue(document.getElementById("stat-table"),
                 s.documents.by_type.table);
    animateValue(document.getElementById("stat-image"),
                 s.documents.by_type.image);
    const fig = document.getElementById("stat-figures");
    if (s.crossmodal) animateValue(fig, s.crossmodal.figures);
    else fig.textContent = "–";
    const q = (s.latency || {})["query.total"];
    document.getElementById("stat-p50").textContent =
      q && q.p50_ms != null ? q.p50_ms.toFixed(0) : "–";
    const gen = document.getElementById("stat-gen");
    if (s.generation) animateValue(gen, s.generation.requests_served);
    else gen.textContent = "–";
  } catch (_) { /* offline */ }
}

async function checkHealth() {
  if (!healthChip) return;
  try {
    const resp = await fetch(`${API}/health`);
    const h = await resp.json();
    const ok = h.status === "healthy";
    healthChip.className = `health-chip ${ok ? "ok" : "warn"}`;
    healthChip.textContent = ok ? "● hoạt động" : `● ${h.status}`;
    healthChip.title = Object.entries(h.components || {})
      .map(([k, v]) => `${k}: ${v.status}`).join("\n");
  } catch (_) {
    healthChip.className = "health-chip err";
    healthChip.textContent = "● mất kết nối";
  }
}

/* ---------------- table: search + sort + render ---------------- */

async function refreshDocuments() {
  try {
    const resp = await fetch(`${API}/documents`);
    const data = await resp.json();
    allDocs = data.documents;
    renderTable();
  } catch (_) { /* offline */ }
}

function sortedDocs() {
  const docs = [...allDocs];
  docs.sort((a, b) => {
    let va, vb;
    if (sortKey === "filename") { va = a.filename || ""; vb = b.filename || ""; }
    else if (sortKey === "timestamp") { va = a.timestamp || ""; vb = b.timestamp || ""; }
    else { va = a.chunks?.[sortKey] ?? 0; vb = b.chunks?.[sortKey] ?? 0; }
    return (va < vb ? -1 : va > vb ? 1 : 0) * sortDir;
  });
  return docs;
}

function renderTable() {
  const filter = docSearch.value.trim().toLowerCase();
  docTable.innerHTML = "";
  let shown = 0;
  for (const doc of sortedDocs()) {
    if (filter && !doc.filename.toLowerCase().includes(filter)
        && !doc.doc_id.toLowerCase().includes(filter)) continue;
    shown++;
    const tr = document.createElement("tr");
    tr.innerHTML =
      `<td class="name" title="${escapeHtml(doc.doc_id)}">` +
      `${typeBadge(doc.filename)} ${escapeHtml(doc.filename)}</td>` +
      `<td>${doc.chunks?.text ?? 0}</td>` +
      `<td>${doc.chunks?.table ?? 0}</td>` +
      `<td>${doc.chunks?.image ?? 0}</td>` +
      `<td class="ts" title="${escapeHtml(doc.timestamp || "")}">` +
      `${relTime(doc.timestamp)}</td>`;
    tr.querySelector(".name").onclick = () => showDetail(doc);
    const td = document.createElement("td");
    const view = document.createElement("button");
    view.className = "small";
    view.textContent = "Chi tiết";
    view.onclick = () => showDetail(doc);
    const btn = document.createElement("button");
    btn.className = "danger small";
    btn.textContent = "Xóa";
    btn.onclick = () => askDelete(doc);
    td.append(view, btn);
    tr.appendChild(td);
    docTable.appendChild(tr);
  }
  const counter = document.getElementById("doc-count");
  if (counter) {
    counter.textContent = filter
      ? `${shown}/${allDocs.length} tài liệu` : `${allDocs.length} tài liệu`;
  }
}

docSearch.addEventListener("input", renderTable);

document.querySelectorAll("th[data-sort]").forEach((th) => {
  th.addEventListener("click", () => {
    const key = th.dataset.sort;
    if (sortKey === key) sortDir = -sortDir;
    else { sortKey = key; sortDir = key === "timestamp" ? -1 : 1; }
    document.querySelectorAll("th[data-sort]").forEach((t) =>
      t.classList.remove("asc", "desc"));
    th.classList.add(sortDir > 0 ? "asc" : "desc");
    renderTable();
  });
});

/* ---------------- document detail modal ---------------- */

function showDetail(doc) {
  const total = (doc.chunks?.text || 0) + (doc.chunks?.table || 0)
    + (doc.chunks?.image || 0);
  detailBody.innerHTML = `
    <h3>${typeBadge(doc.filename)} ${escapeHtml(doc.filename)}</h3>
    <dl>
      <dt>Doc ID</dt><dd><code>${escapeHtml(doc.doc_id)}</code></dd>
      <dt>Đoạn văn</dt><dd>${doc.chunks?.text ?? 0}</dd>
      <dt>Bảng</dt><dd>${doc.chunks?.table ?? 0}</dd>
      <dt>Ảnh</dt><dd>${doc.chunks?.image ?? 0}</dd>
      <dt>Tổng mục</dt><dd>${total}</dd>
      <dt>Nén</dt><dd>${doc.compressed ? "gzip" : "không"}</dd>
      <dt>Thời điểm</dt>
      <dd>${doc.timestamp
        ? new Date(doc.timestamp).toLocaleString("vi-VN") : "–"}</dd>
    </dl>`;
  const del = document.getElementById("detail-delete");
  del.onclick = () => { closeDetail(); askDelete(doc); };
  detailModal.classList.remove("hidden");
}

function closeDetail() { detailModal.classList.add("hidden"); }
document.getElementById("detail-close").onclick = closeDetail;
detailModal.addEventListener("click", (e) => {
  if (e.target === detailModal) closeDetail();
});

/* ---------------- delete ---------------- */

function askDelete(doc) {
  pendingDelete = doc;
  confirmText.textContent = `Xóa "${doc.filename}"?`;
  modal.classList.remove("hidden");
}

function closeConfirm() {
  modal.classList.add("hidden");
  pendingDelete = null;
}

document.getElementById("confirm-no").onclick = closeConfirm;

document.getElementById("confirm-yes").onclick = async () => {
  modal.classList.add("hidden");
  if (!pendingDelete) return;
  const doc = pendingDelete;
  pendingDelete = null;
  try {
    const resp = await fetch(
      `${API}/documents/${encodeURIComponent(doc.doc_id)}`,
      { method: "DELETE" });
    if (resp.ok) toast(`Đã xóa ${doc.filename}`, "ok");
    else toast(`Xóa thất bại: ${resp.status}`, "err");
  } catch (err) { toast(`Lỗi: ${err}`, "err"); }
  refreshDocuments(); refreshStats();
};

document.getElementById("delete-all-btn").onclick = async () => {
  if (!confirm("Xóa TẤT CẢ tài liệu? Hành động này không thể hoàn tác."))
    return;
  try {
    const resp = await fetch(`${API}/documents`, { method: "DELETE" });
    const data = await resp.json();
    if (resp.ok) toast(data.message, "ok");
    else toast(`Thất bại: ${data.detail || resp.status}`, "err");
  } catch (err) { toast(`Lỗi: ${err}`, "err"); }
  refreshDocuments(); refreshStats();
};

/* ---------------- upload (3 concurrent, validated) ---------------- */

fileInput.addEventListener("change", () => handleFiles([...fileInput.files]));

["dragover", "dragenter"].forEach(ev =>
  dropzone.addEventListener(ev, e => {
    e.preventDefault(); dropzone.classList.add("over");
  }));
["dragleave", "drop"].forEach(ev =>
  dropzone.addEventListener(ev, e => {
    e.preventDefault(); dropzone.classList.remove("over");
  }));
dropzone.addEventListener("drop", e =>
  handleFiles([...e.dataTransfer.files]));

function validateFile(file) {
  if (file.size > MAX_FILE_MB * 1024 * 1024)
    return `quá lớn (${formatFileSize(file.size)} > ${MAX_FILE_MB} MB)`;
  const ext = fileExt(file.name);
  if (!ALLOWED_EXT.has(ext)) return `định dạng .${ext} không hỗ trợ`;
  return null;
}

async function handleFiles(files) {
  const queue = [];
  for (const file of files) {
    const err = validateFile(file);
    if (err) toast(`${file.name}: ${err}`, "err");
    else queue.push(file);
  }
  const workers = Array.from(
    { length: Math.min(CONCURRENT_UPLOADS, queue.length) },
    async () => {
      while (queue.length) await uploadFile(queue.shift());
    });
  await Promise.all(workers);
  fileInput.value = "";
  refreshDocuments(); refreshStats();
}

async function uploadFile(file) {
  const row = document.createElement("div");
  row.className = "progress-row";
  row.textContent = `⏳ ${file.name} (${formatFileSize(file.size)})`;
  progress.appendChild(row);
  try {
    const form = new FormData();
    form.append("file", file);
    const resp = await fetch(`${API}/upload`, { method: "POST", body: form });
    const data = await resp.json();
    if (resp.ok) {
      const c = data.chunks_processed || {};
      row.textContent = `✅ ${file.name} — ${c.text ?? 0} đoạn, ` +
        `${c.table ?? 0} bảng, ${c.image ?? 0} ảnh ` +
        `(${(data.processing_time ?? 0).toFixed(1)}s)`;
      toast(`Đã xử lý ${file.name}`, "ok");
    } else {
      row.textContent = `❌ ${file.name}`;
      toast(`${file.name}: ${data.detail || resp.status}`, "err");
    }
  } catch (err) {
    row.textContent = `❌ ${file.name}`;
    toast(`${file.name}: ${err}`, "err");
  }
  setTimeout(() => row.remove(), 8000);
}

/* ---------------- keyboard shortcuts ---------------- */

document.addEventListener("keydown", (e) => {
  if (e.key === "Escape") {
    if (!detailModal.classList.contains("hidden")) closeDetail();
    else if (!modal.classList.contains("hidden")) closeConfirm();
    return;
  }
  const typing = ["INPUT", "TEXTAREA"].includes(document.activeElement?.tagName);
  if (e.key === "/" && !typing) { e.preventDefault(); docSearch.focus(); }
  if ((e.ctrlKey || e.metaKey) && e.key.toLowerCase() === "u") {
    e.preventDefault(); fileInput.click();
  }
});

refreshStats();
refreshDocuments();
checkHealth();
setInterval(() => { refreshStats(); refreshDocuments(); }, 30000);
setInterval(checkHealth, 15000);
