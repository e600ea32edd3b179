/* Admin UI: stat cards, drag-drop batched upload (3 concurrent),
 * searchable document table, delete confirm modal, delete-all, toasts.
 * Own implementation of the reference admin page's feature set. */

const API = "";
const CONCURRENT_UPLOADS = 3;

const docTable = document.getElementById("doc-table");
const docSearch = document.getElementById("doc-search");
const dropzone = document.getElementById("dropzone");
const fileInput = document.getElementById("admin-file-input");
const progress = document.getElementById("admin-upload-progress");
const modal = document.getElementById("confirm-modal");
const confirmText = document.getElementById("confirm-text");

let allDocs = [];
let pendingDelete = null;

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

/* ---------------- stats + table ---------------- */

async function refreshStats() {
  try {
    const resp = await fetch(`${API}/stats`);
    const s = await resp.json();
    document.getElementById("stat-docs").textContent = s.documents.total;
    document.getElementById("stat-text").textContent =
      s.documents.by_type.text;
    document.getElementById("stat-table").textContent =
      s.documents.by_type.table;
    document.getElementById("stat-image").textContent =
      s.documents.by_type.image;
    const fig = document.getElementById("stat-figures");
    fig.textContent = s.crossmodal ? s.crossmodal.figures : "–";
    const q = (s.latency || {})["query.total"];
    document.getElementById("stat-p50").textContent =
      q && q.p50_ms != null ? q.p50_ms.toFixed(0) : "–";
  } catch (_) { /* offline */ }
}

async function refreshDocuments() {
  try {
    const resp = await fetch(`${API}/documents`);
    const data = await resp.json();
    allDocs = data.documents;
    renderTable();
  } catch (_) { /* offline */ }
}

function renderTable() {
  const filter = docSearch.value.trim().toLowerCase();
  docTable.innerHTML = "";
  for (const doc of allDocs) {
    if (filter && !doc.filename.toLowerCase().includes(filter)) continue;
    const tr = document.createElement("tr");
    const ts = doc.timestamp
      ? new Date(doc.timestamp).toLocaleString("vi-VN") : "";
    tr.innerHTML =
      `<td title="${doc.doc_id}">${doc.filename}</td>` +
      `<td>${doc.chunks?.text ?? 0}</td>` +
      `<td>${doc.chunks?.table ?? 0}</td>` +
      `<td>${doc.chunks?.image ?? 0}</td>` +
      `<td class="ts">${ts}</td>`;
    const td = document.createElement("td");
    const btn = document.createElement("button");
    btn.className = "danger small";
    btn.textContent = "Xóa";
    btn.onclick = () => askDelete(doc);
    td.appendChild(btn);
    tr.appendChild(td);
    docTable.appendChild(tr);
  }
}

docSearch.addEventListener("input", renderTable);

/* ---------------- delete ---------------- */

function askDelete(doc) {
  pendingDelete = doc;
  confirmText.textContent = `Xóa "${doc.filename}"?`;
  modal.classList.remove("hidden");
}

document.getElementById("confirm-no").onclick = () => {
  modal.classList.add("hidden");
  pendingDelete = null;
};

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

/* ---------------- upload (3 concurrent) ---------------- */

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

async function handleFiles(files) {
  const queue = [...files];
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
  row.textContent = `⏳ ${file.name}`;
  progress.appendChild(row);
  try {
    const form = new FormData();
    form.append("file", file);
    const resp = await fetch(`${API}/upload`, { method: "POST", body: form });
    const data = await resp.json();
    if (resp.ok) {
      row.textContent = `✅ ${file.name}`;
      toast(`Đã xử lý ${file.name}`, "ok");
    } else {
      row.textContent = `❌ ${file.name}`;
      toast(`${file.name}: ${data.detail || resp.status}`, "err");
    }
  } catch (err) {
    row.textContent = `❌ ${file.name}`;
    toast(`${file.name}: ${err}`, "err");
  }
  setTimeout(() => row.remove(), 6000);
}

refreshStats();
refreshDocuments();
setInterval(() => { refreshStats(); refreshDocuments(); }, 30000);
