/* Chat UI: upload, query with typing indicator, markdown rendering,
 * source chips with relevance %, health polling.
 * Own implementation of the reference chat page's feature set. */

const API = "";

const chatLog = document.getElementById("chat-log");
const chatForm = document.getElementById("chat-form");
const queryInput = document.getElementById("query-input");
const sendBtn = document.getElementById("send-btn");
const fileInput = document.getElementById("file-input");
const uploadProgress = document.getElementById("upload-progress");
const docList = document.getElementById("doc-list");
const healthText = document.getElementById("health-text");
const healthBadge = document.getElementById("health-badge");

/* ---------------- markdown (minimal, safe) ---------------- */

function escapeHtml(s) {
  return s.replace(/&/g, "&amp;").replace(/</g, "&lt;")
          .replace(/>/g, "&gt;").replace(/"/g, "&quot;");
}

function renderMarkdown(text) {
  let html = escapeHtml(text);
  html = html.replace(/```([\s\S]*?)```/g, (_, c) => `<pre>${c}</pre>`);
  html = html.replace(/`([^`]+)`/g, "<code>$1</code>");
  html = html.replace(/^### (.*)$/gm, "<h4>$1</h4>");
  html = html.replace(/^## (.*)$/gm, "<h3>$1</h3>");
  html = html.replace(/^# (.*)$/gm, "<h2>$1</h2>");
  html = html.replace(/\*\*([^*]+)\*\*/g, "<b>$1</b>");
  html = html.replace(/\*([^*]+)\*/g, "<i>$1</i>");
  html = html.replace(/^[-*] (.*)$/gm, "<li>$1</li>");
  html = html.replace(/(<li>[\s\S]*?<\/li>)/g, "<ul>$1</ul>");
  html = html.replace(/\n\n/g, "<br><br>");
  return html;
}

/* ---------------- toasts / input ergonomics ---------------- */

const toastArea = document.getElementById("toast-area");

function showToast(message, type = "info") {
  if (!toastArea) return;
  const el = document.createElement("div");
  el.className = `toast ${type}`;
  el.textContent = message;
  toastArea.appendChild(el);
  setTimeout(() => el.classList.add("visible"), 10);
  setTimeout(() => {
    el.classList.remove("visible");
    setTimeout(() => el.remove(), 300);
  }, 4000);
}

function adjustTextareaHeight() {
  queryInput.style.height = "auto";
  queryInput.style.height = Math.min(queryInput.scrollHeight, 120) + "px";
}

queryInput.addEventListener("input", adjustTextareaHeight);
queryInput.addEventListener("keydown", (e) => {
  if (e.key === "Enter" && !e.shiftKey) {
    e.preventDefault();
    chatForm.requestSubmit();
  }
});

window.addEventListener("error", (e) => {
  showToast(`Lỗi: ${e.message}`, "error");
});
window.addEventListener("unhandledrejection", () => {
  showToast("Có lỗi không mong muốn xảy ra", "error");
});

const TYPE_ICONS = { text: "📄", table: "📊", image: "🖼️" };

const MAX_UPLOAD_MB = 50;
const UPLOAD_EXT = new Set([
  "pdf", "docx", "pptx", "html", "htm", "txt", "md", "markdown",
  "png", "jpg", "jpeg", "gif", "bmp", "webp",
]);

function formatFileSize(bytes) {
  if (!Number.isFinite(bytes)) return "";
  const units = ["B", "KB", "MB", "GB"];
  let i = 0;
  while (bytes >= 1024 && i < units.length - 1) { bytes /= 1024; i++; }
  return `${bytes.toFixed(i ? 1 : 0)} ${units[i]}`;
}

/* ---------------- image attach (reference app.js:276-340) ---------------- */

const MAX_IMAGE_BYTES = 10 * 1024 * 1024;
const IMAGE_TYPES = ["image/png", "image/jpeg", "image/gif", "image/webp"];
const imageInput = document.getElementById("image-input");
const imagePreview = document.getElementById("image-preview");
const attachBtn = document.getElementById("attach-btn");
let currentImage = null;      // data URL for the query body / bubble
let currentImageFile = null;  // File for image→image /search/images

attachBtn.addEventListener("click", () => imageInput.click());
imageInput.addEventListener("change", () => {
  const file = imageInput.files && imageInput.files[0];
  if (!file) return;
  if (file.size > MAX_IMAGE_BYTES) {
    addMessage("bot", "⚠️ Ảnh quá lớn (tối đa 10 MB).");
    imageInput.value = "";
    return;
  }
  if (!IMAGE_TYPES.includes(file.type)) {
    addMessage("bot", "⚠️ Định dạng ảnh không được hỗ trợ (PNG/JPEG/GIF/WebP).");
    imageInput.value = "";
    return;
  }
  const reader = new FileReader();
  reader.onload = (e) => {
    currentImage = e.target.result;
    currentImageFile = file;
    imagePreview.innerHTML = "";
    const img = document.createElement("img");
    img.src = currentImage;
    img.alt = "preview";
    const clear = document.createElement("button");
    clear.type = "button";
    clear.className = "clear-image";
    clear.title = "Xóa ảnh";
    clear.textContent = "✕";
    clear.addEventListener("click", clearImage);
    imagePreview.appendChild(img);
    imagePreview.appendChild(clear);
    imagePreview.hidden = false;
    attachBtn.classList.add("active");
  };
  reader.onerror = () => {
    addMessage("bot", "⚠️ Không đọc được file ảnh.");
    imageInput.value = "";
  };
  reader.readAsDataURL(file);
});

function clearImage() {
  currentImage = null;
  currentImageFile = null;
  imagePreview.innerHTML = "";
  imagePreview.hidden = true;
  imageInput.value = "";
  attachBtn.classList.remove("active");
}

/* ---------------- chat ---------------- */

function addMessage(role, html, sources) {
  const wrap = document.createElement("div");
  wrap.className = `msg ${role}`;
  const bubble = document.createElement("div");
  bubble.className = "bubble";
  bubble.innerHTML = html;
  wrap.appendChild(bubble);
  if (sources && sources.length) {
    const chips = document.createElement("div");
    chips.className = "sources";
    for (const s of sources) {
      const chip = document.createElement("span");
      chip.className = "chip";
      chip.title = s.doc_id;
      const pct = Math.round(s.relevance_score * 100);
      const icon = TYPE_ICONS[s.type] || "📎";
      chip.textContent =
        `${icon} #${s.rank} ${s.type} · ${pct}%`;
      chips.appendChild(chip);
    }
    wrap.appendChild(chips);
  }
  chatLog.appendChild(wrap);
  chatLog.scrollTop = chatLog.scrollHeight;
  return wrap;
}

async function typeMessage(bubble, text, suffixHtml) {
  /* Typewriter reveal (reference app.js:538-556): plain text streams in,
   * then the final markdown render swaps in. Long answers accelerate so
   * the reveal never exceeds ~2.5s. */
  const step = Math.max(3, Math.ceil(text.length / 150));
  for (let i = 0; i < text.length; i += step) {
    bubble.textContent = text.slice(0, i + step);
    chatLog.scrollTop = chatLog.scrollHeight;
    await new Promise((r) => setTimeout(r, 16));
  }
  bubble.innerHTML = renderMarkdown(text) + (suffixHtml || "");
  chatLog.scrollTop = chatLog.scrollHeight;
}

function addTyping() {
  const wrap = addMessage("bot",
    '<span class="typing"><span></span><span></span><span></span></span>');
  wrap.id = "typing-indicator";
  return wrap;
}

function addSystemMessage(text) {
  const el = document.createElement("div");
  el.className = "msg system";
  el.textContent = text;
  chatLog.appendChild(el);
  chatLog.scrollTop = chatLog.scrollHeight;
}

/* Staggered welcome (reference app.js:100-113). */
function addWelcomeMessages() {
  const msgs = [
    "👋 Xin chào! Tôi là trợ lý AI của bạn.",
    "📚 Hãy upload tài liệu và đặt câu hỏi cho tôi!",
    "💡 Tôi có thể tìm kiếm trong PDF, DOCX, PPTX, HTML, Markdown và cả hình ảnh.",
  ];
  msgs.forEach((m, i) => setTimeout(() => addMessage("bot", m), i * 450));
}

/* Failed queries get a retry button instead of a dead end. */
function addErrorWithRetry(text, retry) {
  const msg = addMessage("bot", `⚠️ ${escapeHtml(text)} `);
  const btn = document.createElement("button");
  btn.type = "button";
  btn.className = "retry-btn";
  btn.textContent = "↻ Thử lại";
  btn.onclick = () => { msg.remove(); retry(); };
  msg.querySelector(".bubble").appendChild(btn);
}

chatForm.addEventListener("submit", async (e) => {
  e.preventDefault();
  const query = queryInput.value.trim();
  if (!query) return;
  const sentImage = currentImage;
  const sentImageFile = currentImageFile;
  // Image renders inside the user bubble (reference app.js:474-484).
  let userHtml = "";
  if (sentImage) {
    userHtml += `<img class="message-image" src="${sentImage}" alt="ảnh đính kèm">`;
  }
  userHtml += escapeHtml(query);
  addMessage("user", userHtml);
  queryInput.value = "";
  adjustTextareaHeight();
  clearImage();
  await runQuery(query, sentImage, sentImageFile);
});

async function runQuery(query, sentImage, sentImageFile) {
  sendBtn.disabled = true;
  const typing = addTyping();
  const retry = () => runQuery(query, sentImage, sentImageFile);
  try {
    const body = {
      query,
      top_k: 5,
      use_multimodal: document.getElementById("multimodal-toggle").checked
        || !!sentImage,
      rerank: document.getElementById("rerank-toggle").checked,
    };
    if (sentImage) body.image = sentImage;
    const resp = await fetch(`${API}/query`, {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify(body),
    });
    const data = await resp.json();
    typing.remove();
    if (!resp.ok) {
      addErrorWithRetry(`Lỗi: ${data.detail || resp.status}`, retry);
    } else {
      const t = data.processing_time ? data.processing_time.toFixed(1) : "?";
      const msg = addMessage("bot", "", data.sources);
      await typeMessage(
        msg.querySelector(".bubble"), data.answer,
        `<div class="meta">⏱ ${t}s</div>`);
      if (sentImageFile) {
        attachSimilarFigures(msg, sentImageFile);  // image → image
      } else {
        attachFigures(msg, query);                 // text → image
      }
    }
  } catch (err) {
    typing.remove();
    addErrorWithRetry(`Không kết nối được máy chủ: ${String(err)}`, retry);
  } finally {
    sendBtn.disabled = false;
    queryInput.focus();
  }
}

/* ---------------- cross-modal figures ---------------- */

let figuresAvailable = true; // flips off on the first 503 (feature disabled)

async function attachFigures(msgEl, query) {
  if (!figuresAvailable) return;
  try {
    const resp = await fetch(`${API}/search/images`, {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify({ query, top_k: 4 }),
    });
    if (resp.status === 503) { figuresAvailable = false; return; }
    if (!resp.ok) return;
    const data = await resp.json();
    const hits = (data.results || []).filter((h) => h.path);
    if (!hits.length) return;
    const row = document.createElement("div");
    row.className = "figure-row";
    for (const h of hits) {
      const name = h.path.split("/").pop();
      const img = document.createElement("img");
      img.src = `${API}/figures/${encodeURIComponent(name)}`;
      img.title = `${h.doc_id} · ${(h.relevance * 100).toFixed(0)}%`;
      img.loading = "lazy";
      img.onerror = () => img.remove();
      row.appendChild(img);
    }
    msgEl.appendChild(row);
    chatLog.scrollTop = chatLog.scrollHeight;
  } catch (_) { /* non-fatal */ }
}

async function attachSimilarFigures(msgEl, file) {
  /* image → image retrieval via the multipart /search/images route */
  if (!figuresAvailable) return;
  try {
    const form = new FormData();
    form.append("file", file);
    form.append("top_k", "4");
    const resp = await fetch(`${API}/search/images`, {
      method: "POST",
      body: form,
    });
    if (resp.status === 503) { figuresAvailable = false; return; }
    if (!resp.ok) return;
    const data = await resp.json();
    const hits = (data.results || []).filter((h) => h.path);
    if (!hits.length) return;
    const row = document.createElement("div");
    row.className = "figure-row";
    const label = document.createElement("div");
    label.className = "meta";
    label.textContent = "Hình tương tự:";
    msgEl.appendChild(label);
    for (const h of hits) {
      const name = h.path.split("/").pop();
      const img = document.createElement("img");
      img.src = `${API}/figures/${encodeURIComponent(name)}`;
      img.title = `${h.doc_id} · ${(h.relevance * 100).toFixed(0)}%`;
      img.loading = "lazy";
      img.onerror = () => img.remove();
      row.appendChild(img);
    }
    msgEl.appendChild(row);
    chatLog.scrollTop = chatLog.scrollHeight;
  } catch (_) { /* non-fatal */ }
}

/* ---------------- upload ---------------- */

fileInput.addEventListener("change", () => uploadFiles([...fileInput.files]));

async function uploadFiles(files) {
  for (const file of files) {
    // Client-side gates mirroring the server's (reference app.js:140-150).
    const ext = (/\.([A-Za-z0-9]+)$/.exec(file.name) || [])[1]?.toLowerCase();
    if (file.size > MAX_UPLOAD_MB * 1024 * 1024) {
      showToast(
        `${file.name} quá lớn (${formatFileSize(file.size)} > ` +
        `${MAX_UPLOAD_MB} MB)`, "error");
      continue;
    }
    if (!ext || !UPLOAD_EXT.has(ext)) {
      showToast(`${file.name}: định dạng không hỗ trợ`, "error");
      continue;
    }
    const row = document.createElement("div");
    row.className = "progress-row";
    row.textContent = `⏳ ${file.name} (${formatFileSize(file.size)})`;
    uploadProgress.appendChild(row);
    try {
      const form = new FormData();
      form.append("file", file);
      const resp = await fetch(`${API}/upload`, { method: "POST", body: form });
      const data = await resp.json();
      if (resp.ok) {
        const c = data.chunks_processed;
        row.textContent =
          `✅ ${file.name} (${c.text}t/${c.table}b/${c.image}a)`;
        addMessage("bot",
          `Đã xử lý <b>${escapeHtml(file.name)}</b>: ${c.text} đoạn văn, ` +
          `${c.table} bảng, ${c.image} ảnh.`);
      } else {
        row.textContent = `❌ ${file.name}: ${data.detail || resp.status}`;
        showToast(`Tải lên thất bại: ${file.name}`, "error");
      }
    } catch (err) {
      row.textContent = `❌ ${file.name}: ${err}`;
      showToast(`Tải lên thất bại: ${file.name}`, "error");
    }
    setTimeout(() => row.remove(), 8000);
    refreshDocs();
  }
  fileInput.value = "";
}

/* ---------------- documents ---------------- */

async function refreshDocs() {
  try {
    const resp = await fetch(`${API}/documents`);
    const data = await resp.json();
    docList.innerHTML = "";
    for (const doc of data.documents.slice(0, 20)) {
      const li = document.createElement("li");
      li.textContent = `${doc.filename} (${doc.item_count})`;
      li.title = doc.doc_id;
      docList.appendChild(li);
    }
  } catch (_) { /* server offline */ }
}

/* ---------------- health ---------------- */

async function pollHealth() {
  try {
    const resp = await fetch(`${API}/health`);
    const data = await resp.json();
    healthBadge.className = `health ${data.status}`;
    healthText.textContent = data.status === "healthy"
      ? "hoạt động" : data.status === "degraded" ? "suy giảm" : "lỗi";
  } catch (_) {
    healthBadge.className = "health unhealthy";
    healthText.textContent = "mất kết nối";
  }
}

refreshDocs();
pollHealth();
addWelcomeMessages();
setInterval(pollHealth, 30000);
