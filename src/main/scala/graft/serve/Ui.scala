package graft.serve

/** Minimal static dashboard over the JSON surface — the counterpart of the
  * reference's 9 Jinja templates (reference/templates/index.html,
  * login.html, alerts.html, …; routes web_scheduler.py:1585-1603). The
  * reference renders server-side; here ONE static page drives the existing
  * REST endpoints with `fetch` (session cookie set by POST /api/login), so
  * the whole UI layer adds zero server logic beyond serving this string.
  * Covers every page the reference templates ship: login, task list with
  * run-now, per-task run logs, SQL scripts, alerts, db-configs, email
  * configs (with set-default), notification logs, and users.
  */
object Ui {

  val indexHtml: String =
    """<!DOCTYPE html>
<html lang="zh">
<head>
<meta charset="utf-8">
<title>graft 调度管理平台</title>
<style>
  body { font-family: system-ui, sans-serif; margin: 0; background: #f5f6f8; color: #222; }
  header { background: #1f3a5f; color: #fff; padding: 10px 20px; display: flex;
           justify-content: space-between; align-items: center; }
  header h1 { font-size: 18px; margin: 0; }
  main { max-width: 1100px; margin: 20px auto; padding: 0 16px; }
  section { background: #fff; border-radius: 6px; padding: 16px; margin-bottom: 16px;
            box-shadow: 0 1px 3px rgba(0,0,0,.08); }
  h2 { font-size: 15px; margin: 0 0 10px; }
  table { border-collapse: collapse; width: 100%; font-size: 13px; }
  th, td { border-bottom: 1px solid #e3e6ea; padding: 6px 8px; text-align: left; }
  th { color: #555; font-weight: 600; }
  button { background: #1f3a5f; color: #fff; border: 0; border-radius: 4px;
           padding: 5px 10px; cursor: pointer; font-size: 12px; }
  button.ghost { background: #eef1f5; color: #1f3a5f; }
  input { padding: 6px 8px; border: 1px solid #ccd2d9; border-radius: 4px; }
  #login { max-width: 320px; margin: 80px auto; }
  .row { display: flex; gap: 8px; margin-bottom: 8px; }
  .ok { color: #1a7f37; } .bad { color: #b42318; }
  #msg { min-height: 18px; font-size: 13px; }
  pre { background: #f2f4f7; padding: 8px; border-radius: 4px; max-height: 220px;
        overflow: auto; font-size: 12px; white-space: pre-wrap; }
</style>
</head>
<body>
<header>
  <h1>graft 调度管理平台</h1>
  <div id="who"></div>
</header>
<main>
  <section id="login">
    <h2>登录</h2>
    <div class="row"><input id="u" placeholder="用户名" value=""></div>
    <div class="row"><input id="p" type="password" placeholder="密码"></div>
    <div class="row"><button onclick="login()">登录</button></div>
    <div id="msg"></div>
  </section>

  <div id="app" style="display:none">
    <section>
      <h2>任务管理 <button class="ghost" onclick="loadAll()">刷新</button></h2>
      <table id="tasks"><thead><tr>
        <th>ID</th><th>名称</th><th>类型</th><th>调度</th><th>上次运行</th>
        <th>下次运行</th><th>状态</th><th>操作</th>
      </tr></thead><tbody></tbody></table>
    </section>
    <section>
      <h2>运行日志</h2>
      <pre id="logs">（点击任务行查看日志）</pre>
    </section>
    <section>
      <h2>SQL 脚本</h2>
      <table id="scripts"><thead><tr><th>ID</th><th>名称</th><th>数据库配置</th></tr>
      </thead><tbody></tbody></table>
    </section>
    <section>
      <h2>SQL 告警</h2>
      <table id="alerts"><thead><tr><th>ID</th><th>名称</th><th>条件</th>
        <th>启用</th></tr></thead><tbody></tbody></table>
    </section>
    <section>
      <h2>数据库配置</h2>
      <table id="dbs"><thead><tr><th>ID</th><th>名称</th><th>类型</th>
        <th>主机</th><th>端口</th></tr></thead><tbody></tbody></table>
    </section>
    <section>
      <h2>邮件配置</h2>
      <table id="emails"><thead><tr><th>ID</th><th>名称</th><th>服务器</th>
        <th>端口</th><th>发件人</th><th>默认</th><th>通知</th><th>操作</th>
      </tr></thead><tbody></tbody></table>
    </section>
    <section>
      <h2>通知日志</h2>
      <table id="nlogs"><thead><tr><th>ID</th><th>任务</th><th>类型</th>
        <th>收件人</th><th>状态</th><th>发送时间</th></tr></thead><tbody></tbody></table>
    </section>
    <section>
      <h2>用户管理</h2>
      <table id="users"><thead><tr><th>ID</th><th>用户名</th><th>创建时间</th>
      </tr></thead><tbody></tbody></table>
    </section>
  </div>
</main>
<script>
const $ = s => document.querySelector(s);
const cell = v => { const td = document.createElement('td');
  td.textContent = v == null ? '' : v; return td; };
async function api(path, opts) {
  const r = await fetch(path, Object.assign({credentials: 'same-origin'}, opts));
  const j = await r.json().catch(() => ({}));
  if (r.status === 401) { $('#app').style.display = 'none';
    $('#login').style.display = 'block'; throw new Error('未授权访问'); }
  return {status: r.status, body: j};
}
async function login() {
  const r = await api('/api/login', {method: 'POST',
    headers: {'Content-Type': 'application/json'},
    body: JSON.stringify({username: $('#u').value, password: $('#p').value})});
  $('#msg').textContent = r.body.message || r.body.error || '';
  $('#msg').className = r.status === 200 ? 'ok' : 'bad';
  if (r.status === 200) {
    $('#login').style.display = 'none'; $('#app').style.display = 'block';
    $('#who').textContent = $('#u').value;
    loadAll();
  }
}
function fill(sel, rows, cols) {
  const tb = $(sel + ' tbody'); tb.innerHTML = '';
  (rows || []).forEach(r => {
    const tr = document.createElement('tr');
    cols.forEach(c => tr.appendChild(cell(typeof c === 'function' ? c(r) : r[c])));
    tb.appendChild(tr); tr.dataset.id = r.id;
  });
  return tb;
}
async function loadAll() {
  const t = await api('/api/tasks');
  const tb = fill('#tasks', t.body.tasks || t.body,
    ['id', 'name', 'task_type',
     r => r.cron_expression || (r.schedule_interval ? r.schedule_interval + 's' : ''),
     'last_run', 'next_run',
     r => (r.is_active ? '启用' : '停用') +
          (r.latest_status ? ' / ' + r.latest_status : '')]);
  [...tb.rows].forEach(tr => {
    const td = document.createElement('td');
    const b = document.createElement('button'); b.textContent = '立即执行';
    b.onclick = async e => { e.stopPropagation();
      const r = await api('/api/tasks/' + tr.dataset.id + '/run', {method: 'POST'});
      alert(r.body.message || r.body.error); loadAll(); };
    td.appendChild(b); tr.appendChild(td);
    tr.onclick = () => showLogs(tr.dataset.id);
  });
  const s = await api('/api/sql-scripts');
  fill('#scripts', s.body.sql_scripts || s.body, ['id', 'name', 'db_config_name']);
  const a = await api('/api/sql-alerts');
  fill('#alerts', Array.isArray(a.body) ? a.body : (a.body.alerts || []),
    ['id', 'name', r => (r.condition_type || '') + ' ' + (r.threshold ?? ''),
     r => r.is_enabled ? '是' : '否']);
  const d = await api('/api/db-configs');
  fill('#dbs', Array.isArray(d.body) ? d.body : (d.body.configs || []),
    ['id', 'name', 'db_type', 'host', 'port']);
  const e = await api('/api/email-configs');
  const eb = fill('#emails', Array.isArray(e.body) ? e.body : [],
    ['id', 'config_name', 'mail_server', 'mail_port', 'mail_default_sender',
     r => r.is_default ? '是' : '', r => r.mail_notification_enabled ? '开' : '关']);
  [...eb.rows].forEach(tr => {
    const td = document.createElement('td');
    const b = document.createElement('button'); b.className = 'ghost';
    b.textContent = '设为默认';
    b.onclick = async () => {
      const r = await api('/api/email-configs/' + tr.dataset.id + '/set-default',
        {method: 'POST'});
      alert(r.body.message || r.body.error); loadAll(); };
    td.appendChild(b); tr.appendChild(td);
  });
  const n = await api('/api/notification-logs?per_page=20');
  fill('#nlogs', n.body.logs || [],
    ['id', 'task_name', 'alert_type', 'recipients', 'status', 'sent_time']);
  const us = await api('/api/users');
  fill('#users', us.body.users || [], ['id', 'username', 'created_at']);
}
async function showLogs(id) {
  const r = await api('/api/task-logs/' + id);
  const logs = r.body.logs || r.body;
  $('#logs').textContent = (logs || []).map(l =>
    `${l.execution_time}  [${l.status}]  ${l.message}`).join('\n') || '（无日志）';
}
</script>
</body>
</html>
"""
}
